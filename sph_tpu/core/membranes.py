"""Liquid <-> membrane interaction.

Counterpart of the reference's three-kernel group ``clearMembraneBuffers`` /
``computeInteractionWithMembranes`` / ``..._finalize``
(`/root/reference/src/sphFluid.cl:1214-1682`), which runs *after* integration
on the updated positions: each liquid particle collects the membrane
triangles of its elastic neighbors, averages oriented plane normals per
neighbor, and applies an Ihmsen-style position projection; deltas accumulate
in a scratch buffer and are applied in a second phase. Here the two-phase
accumulate-then-apply structure is a pure functional update, so the scratch
halves of position/velocity (cl:1224-1225) have no equivalent.

TPU re-design of the inner math: the reference projects the particle onto
each triangle plane via 3x3 Cramer determinants (cl:1229-1308) only to form
``normalize(x_i - proj)`` — which is exactly the triangle's unit plane normal
oriented toward x_i. We precompute unit normals per triangle once per step
and orient by the sign of a dot product, eliminating the per-(particle,
neighbor, triangle) solve. All math is component-split (ops/vec3.py).

Documented deviation: the reference zeroes the **z** component of the
particle-to-neighbor vector before taking its length (cl:1437, a likely typo
for ``.w`` when converting from subscripting); we use the true 3D distance.
Degenerate cases the reference aborts on with printf (zero-area triangle,
particle exactly in-plane, cl:1468-1472/1501-1505) are masked out instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimParams
from ..constants import ELASTIC_PARTICLE
from ..ops.vec3 import V3, masked
from .neighbors import NeighborList
from .state import Membranes


def triangle_normals(pos: V3, membranes: Membranes) -> tuple[V3, V3]:
    """Unit plane normals and reference vertex positions (V3 of [M])."""
    va = pos.take(membranes.tris[:, 0])
    vb = pos.take(membranes.tris[:, 1])
    vc = pos.take(membranes.tris[:, 2])
    ab, ac = vb - va, vc - va
    n = V3(
        ab.y * ac.z - ab.z * ac.y,
        ab.z * ac.x - ab.x * ac.z,
        ab.x * ac.y - ab.y * ac.x,
    )
    n2 = n.norm2()
    inv = jnp.where(n2 > 0.0, jax.lax.rsqrt(jnp.maximum(n2, 1e-30)), 0.0)
    return n * inv, va


def membrane_position_correction(
    pos: V3,
    ptype: jax.Array,
    nbrs: NeighborList,
    membranes: Membranes,
    params: SimParams,
    liquid_range: tuple[int, int],
) -> V3:
    """Return updated positions after membrane interaction.

    Only particles in the (static) ``liquid_range`` slice are processed —
    liquid particles are contiguous in both scene layouts, so this is the
    static-shape equivalent of the reference's per-particle type check
    (cl:1393-1395).
    """
    if membranes.n_tris == 0:
        return pos
    lo, hi = liquid_range
    if hi <= lo:
        return pos

    n_plane, ref_a = triangle_normals(pos, membranes)

    sl = slice(lo, hi)
    x_i = V3(pos.x[sl], pos.y[sl], pos.z[sl])   # [L]
    idx = nbrs.idx[sl]                           # [L,32]
    valid = nbrs.valid[sl]
    j = jnp.maximum(idx, 0)
    elastic_j = valid & (ptype[j] == ELASTIC_PARTICLE)

    # 3D particle-to-neighbor distance (see deviation note in module doc).
    dist_ij = (x_i.expand(1) - pos.take(j)).norm()  # [L,32]

    # Triangles of each elastic neighbor: [L,32,7].
    t = membranes.particle_tris[j]
    t_ok = elastic_j[..., None] & (t >= 0)
    t_safe = jnp.maximum(t, 0)
    n_t = n_plane.take(t_safe)                   # V3 of [L,32,7]
    a_t = ref_a.take(t_safe)

    # Orient each plane normal toward the liquid particle (the reference's
    # normalize(x_i - projection), cl:1477-1483).
    s = (x_i.expand(1).expand(2) - a_t).dot(n_t)  # [L,32,7]
    n_nonzero = n_t.norm2() > 0.0
    contrib_ok = t_ok & (s != 0.0) & n_nonzero
    sgn = jnp.where(contrib_ok, jnp.sign(s), 0.0)

    cnt = jnp.sum(contrib_ok, axis=-1)            # [L,32]
    inv_cnt = 1.0 / jnp.maximum(cnt, 1)
    n_avg = (n_t * sgn).sum(axis=2) * inv_cnt     # V3 of [L,32]

    is_entry = cnt > 0                            # neighbor in >=1 membrane
    r0 = jnp.float32(params.r0)
    w = jnp.where(is_entry, jnp.maximum(0.0, (r0 - dist_ij) / r0), 0.0)
    n_ci = (n_avg * w).sum(axis=1)                # V3 of [L]
    w_sum = jnp.sum(w, axis=1)
    w2_sum = jnp.sum(w * (r0 - dist_ij) * is_entry, axis=1)

    n_len2 = n_ci.norm2()
    has = n_len2 > 0.0
    inv_len = jax.lax.rsqrt(jnp.maximum(n_len2, 1e-30))
    coef = jnp.where(has, inv_len * w2_sum / jnp.maximum(w_sum, 1e-30), 0.0)
    delta = n_ci * coef

    return V3(
        pos.x.at[sl].add(delta.x),
        pos.y.at[sl].add(delta.y),
        pos.z.at[sl].add(delta.z),
    )
