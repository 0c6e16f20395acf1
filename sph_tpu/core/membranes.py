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
neighbor, triangle) solve.

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
from .neighbors import NeighborList
from .state import Membranes


def triangle_normals(
    pos: jax.Array, membranes: Membranes
) -> tuple[jax.Array, jax.Array]:
    """Unit plane normals [M,3] and reference vertex positions [M,3]."""
    tri_pos = pos[membranes.tris]  # [M,3,3]
    a = tri_pos[:, 0]
    n = jnp.cross(tri_pos[:, 1] - a, tri_pos[:, 2] - a)
    length = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    n = jnp.where(length > 0.0, n / jnp.maximum(length, 1e-30), 0.0)
    return n, a


def membrane_position_correction(
    pos: jax.Array,
    ptype: jax.Array,
    nbrs: NeighborList,
    membranes: Membranes,
    params: SimParams,
    liquid_range: tuple[int, int],
) -> jax.Array:
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

    x_i = pos[lo:hi]                    # [L,3]
    idx = nbrs.idx[lo:hi]               # [L,32]
    valid = nbrs.valid[lo:hi]
    j = jnp.maximum(idx, 0)
    elastic_j = valid & (ptype[j] == ELASTIC_PARTICLE)

    # 3D particle-to-neighbor distance (see deviation note in module doc).
    d_ij = x_i[:, None, :] - pos[j]
    dist_ij = jnp.sqrt(jnp.sum(d_ij * d_ij, axis=-1))  # [L,32]

    # Triangles of each elastic neighbor: [L,32,7].
    t = membranes.particle_tris[j]
    t_ok = elastic_j[..., None] & (t >= 0)
    t_safe = jnp.maximum(t, 0)
    n_t = n_plane[t_safe]               # [L,32,7,3]
    a_t = ref_a[t_safe]

    # Orient each plane normal toward the liquid particle (the reference's
    # normalize(x_i - projection), cl:1477-1483).
    s = jnp.sum((x_i[:, None, None, :] - a_t) * n_t, axis=-1)  # [L,32,7]
    n_nonzero = jnp.sum(n_t * n_t, axis=-1) > 0.0
    contrib_ok = t_ok & (s != 0.0) & n_nonzero
    oriented = jnp.sign(s)[..., None] * n_t

    cnt = jnp.sum(contrib_ok, axis=-1)  # [L,32]
    n_avg = jnp.sum(
        jnp.where(contrib_ok[..., None], oriented, 0.0), axis=2
    ) / jnp.maximum(cnt, 1)[..., None]

    is_entry = cnt > 0                  # neighbor belongs to >=1 membrane
    r0 = jnp.float32(params.r0)
    w = jnp.where(is_entry, jnp.maximum(0.0, (r0 - dist_ij) / r0), 0.0)
    n_ci = jnp.sum(n_avg * w[..., None], axis=1)       # [L,3]
    w_sum = jnp.sum(w, axis=1)
    w2_sum = jnp.sum(w * (r0 - dist_ij) * is_entry, axis=1)

    n_len2 = jnp.sum(n_ci * n_ci, axis=-1)
    has = n_len2 > 0.0
    n_len = jnp.sqrt(jnp.maximum(n_len2, 1e-30))
    delta = (n_ci / n_len[:, None]) * (
        w2_sum / jnp.maximum(w_sum, 1e-30)
    )[:, None]
    x_new = jnp.where(has[:, None], x_i + delta, x_i)

    return pos.at[lo:hi].set(x_new)
