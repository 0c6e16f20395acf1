"""Elastic (spring) and muscle contraction forces.

Counterpart of ``pcisph_computeElasticForces``
(`/root/reference/src/sphFluid.cl:709-815`): per elastic particle, walk its
padded spring list; Hooke acceleration ``-(r_hat) * (r - r0) * k`` with
k = 6e8 (cl:741, :775), plus a contraction term ``-(r_hat) * signal * 800``
when the spring's muscle id is active (cl:777-784). The reference's
muscle-matching inner loop over all 100 muscles per spring (cl:777) is a
single gather here. The commented-out center-of-mass damping block
(cl:787-800) is dead code upstream and intentionally not reproduced.

Springs live in absolute particle-id space, so the reference's load-path
dependent ``offset`` argument (`owOpenCLSolver.cpp:435`) does not exist.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax

from ..config import SimParams
from .state import Springs


def add_elastic_forces(
    a_ext: jax.Array,
    pos: jax.Array,
    springs: Springs,
    activation: jax.Array,
    params: SimParams,
) -> jax.Array:
    """Scatter-add spring + muscle accelerations into ``a_ext``.

    Shapes: pos [N,3] sim units; activation [MUSCLE_COUNT]; returns [N,3].
    """
    if springs.n_elastic == 0:
        return a_ext

    i = springs.row_ids                       # [Ne]
    valid = springs.idx >= 0                  # [Ne,32]
    j = jnp.maximum(springs.idx, 0)

    scale = jnp.float32(params.simulation_scale)
    d = (pos[i][:, None, :] - pos[j]) * scale  # [Ne,32,3] meters
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))      # [Ne,32]
    ok = valid & (r != 0.0)
    r_safe = jnp.maximum(r, 1e-30)
    r_hat = d / r_safe[..., None]

    stretch = r - springs.rest
    coef = jnp.where(ok, -stretch * jnp.float32(params.k_spring), 0.0)

    muscle_id = springs.muscle                 # [Ne,32], 0 = plain
    act = activation[jnp.maximum(muscle_id - 1, 0)]
    m_on = ok & (muscle_id > 0) & (act > 0.0)
    coef = coef + jnp.where(
        m_on, -act * jnp.float32(params.muscle_force), 0.0
    )

    a = jnp.sum(coef[..., None] * r_hat, axis=1)  # [Ne,3]
    return a_ext.at[i].add(a)
