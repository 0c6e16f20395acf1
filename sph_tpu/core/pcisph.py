"""PCISPH solver core: density, external forces, the prediction-correction
loop, boundary handling, and integration.

Physics is the reference's, re-factored for f32 TPUs (see
:mod:`sph_tpu.config` for the nondimensionalization). Per-kernel citations:

* density           — `/root/reference/src/sphFluid.cl:472-518`
* ext forces        — `sphFluid.cl:589-708` (viscosity, gravity, surf. tension)
* predict positions — `sphFluid.cl:889-979`
* predict density   — `sphFluid.cl:982-1059`
* correct pressure  — `sphFluid.cl:1062-1098`
* pressure force    — `sphFluid.cl:1101-1212` (incl. close-range anti-clump)
* boundary response — `sphFluid.cl:824-887` (Ihmsen et al. 2010 frozen particles)
* integrate         — `sphFluid.cl:1684-1808`

Reference quirks preserved deliberately (they shape the dynamics):
* Position prediction integrates **only** the pressure acceleration; the
  viscous/gravity/elastic half is commented out upstream (sphFluid.cl:924).
* Pressure is corrected for *all* particles including boundary ones
  (the boundary skip at sphFluid.cl:1084-1086 is commented out), which is
  what gives frozen boundary particles their pressure contribution.
* For boundary neighbors the "velocity" entering the viscosity sum is the
  stored wall normal — the reference keeps normals in the velocity buffer
  (sphFluid.cl:653 reading what :860 documents as normals).
* Integration writes back the *average* of old and new velocity
  (sphFluid.cl:1759) after computing the position from the full new velocity.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimParams
from ..constants import BOUNDARY_PARTICLE
from ..ops.smoothing import poly6_term, spiky_term, visc_term
from .neighbors import NeighborList


class _Gathered(NamedTuple):
    j: jax.Array        # [N,32] safe (clamped) neighbor ids
    mask: jax.Array     # [N,32] valid slots
    mask_h: jax.Array   # [N,32] valid and strictly inside radius (q < 1)


def _gather_ids(nbrs: NeighborList) -> _Gathered:
    j = jnp.maximum(nbrs.idx, 0)
    return _Gathered(j=j, mask=nbrs.valid, mask_h=nbrs.valid & (nbrs.q < 1.0))


def compute_density(nbrs: NeighborList, params: SimParams) -> jax.Array:
    """rho_i = c_rho * max(1, sum_j (1 - q^2)^3).

    The max(1, .) clamp is the reference's `density < hScaled6 -> hScaled6`
    (sphFluid.cl:514) in nondimensional form; 1 is exactly the missing
    self-contribution term.
    """
    q2 = nbrs.q * nbrs.q
    s = jnp.sum(jnp.where(nbrs.valid, poly6_term(q2), 0.0), axis=1)
    s = jnp.maximum(s, 1.0)
    return jnp.float32(params.c_rho) * s


def compute_external_forces(
    pos: jax.Array,
    vel: jax.Array,
    rho: jax.Array,
    ptype: jax.Array,
    normal: jax.Array,
    nbrs: NeighborList,
    params: SimParams,
) -> jax.Array:
    """Viscosity + gravity + surface tension -> a_ext [N,3].

    Boundary particles get zero (they never move, sphFluid.cl:616-622).
    """
    g = _gather_ids(nbrs)
    m = g.mask_h[..., None].astype(pos.dtype)

    # Boundary particles' "velocity" is their wall normal (see module doc).
    is_b_j = (ptype[g.j] == BOUNDARY_PARTICLE)[..., None]
    vel_j = jnp.where(is_b_j, normal[g.j], vel[g.j])

    inv_rho_j = 1.0 / rho[g.j]
    visc = jnp.sum(
        (vel_j - vel[:, None, :])
        * (visc_term(nbrs.q) * inv_rho_j)[..., None]
        * m,
        axis=1,
    )
    a_visc = jnp.float32(params.c_visc) * visc / rho[:, None]

    st = jnp.sum((pos[:, None, :] - pos[g.j]) * m, axis=1)
    a_st = jnp.float32(params.c_surf) * st

    grav = jnp.asarray(params.gravity, dtype=pos.dtype)
    a = a_visc + a_st + grav
    is_b = (ptype == BOUNDARY_PARTICLE)[:, None]
    return jnp.where(is_b, 0.0, a)


class PcisphResult(NamedTuple):
    pressure: jax.Array  # [N]
    a_p: jax.Array       # [N,3] pressure-force acceleration


def pcisph_pressure_loop(
    pos: jax.Array,
    vel: jax.Array,
    ptype: jax.Array,
    nbrs: NeighborList,
    params: SimParams,
) -> PcisphResult:
    """The fixed-3-iteration prediction-correction loop
    (`owPhysicsFluidSimulator.cpp:99-106`), fully on device via fori_loop."""
    n = pos.shape[0]
    g = _gather_ids(nbrs)
    is_b = ptype == BOUNDARY_PARTICLE
    is_b3 = is_b[:, None]

    dt = jnp.float32(params.time_step)
    pos_dt = jnp.float32(params.time_step * params.simulation_scale_inv)
    inv_h2 = jnp.float32(1.0 / (params.h * params.h))
    c_rho = jnp.float32(params.c_rho)
    rho0 = jnp.float32(params.rho0)
    delta = jnp.float32(params.delta)
    c_press = jnp.float32(params.c_press)

    # Unit vectors i->j and the anti-clump branch depend only on the step-start
    # geometry (the reference uses cached neighbor distances, sphFluid.cl:1156),
    # so hoist them out of the loop.
    diff = pos[:, None, :] - pos[g.j]  # [N,32,3] sim units
    safe_q = jnp.maximum(nbrs.q, 1e-30)
    unit_ij = diff / (safe_q * jnp.float32(params.h))[..., None]
    nonzero_r = nbrs.q > 0.0

    # Close-range anti-clump substitution (sphFluid.cl:1166-1170):
    # below q = 0.25, the pair term swaps to a rho0*delta-driven repulsion.
    close = nbrs.q < 0.25
    term_close = (0.25 - nbrs.q) ** 2 * 0.5 * (rho0 * delta)
    term_far_geom = spiky_term(nbrs.q) * 0.5

    def body(_, carry):
        p, a_p = carry
        # -- predict positions (boundary stays put) --
        v_star = vel + dt * a_p
        x_star = pos + pos_dt * v_star
        x_star = jnp.where(is_b3, pos, x_star)

        # -- predicted density from predicted positions --
        dstar = x_star[:, None, :] - x_star[g.j]
        q2s = jnp.sum(dstar * dstar, axis=-1) * inv_h2
        contrib = jnp.where(
            g.mask & (q2s < 1.0), poly6_term(q2s), 0.0
        )
        rho_star = c_rho * jnp.maximum(jnp.sum(contrib, axis=1), 1.0)

        # -- pressure correction: all particles, non-negative increment --
        p = p + jnp.maximum(0.0, (rho_star - rho0) * delta)

        # -- pressure-force acceleration --
        inv_rho_star_j = 1.0 / rho_star[g.j]
        pair_p = p[:, None] + p[g.j]
        term = jnp.where(close, term_close, term_far_geom * pair_p)
        term = term * inv_rho_star_j
        w = jnp.where(g.mask_h & nonzero_r, term, 0.0)
        f = jnp.sum(w[..., None] * unit_ij, axis=1)
        a_p = (c_press / rho_star)[:, None] * f
        a_p = jnp.where(is_b3, 0.0, a_p)
        return p, a_p

    p0 = jnp.zeros((n,), dtype=pos.dtype)
    a0 = jnp.zeros_like(pos)
    p, a_p = jax.lax.fori_loop(0, params.n_pcisph_iters, body, (p0, a0))
    return PcisphResult(pressure=p, a_p=a_p)


def boundary_response(
    x_new: jax.Array,
    v_new: jax.Array,
    pos0: jax.Array,
    ptype: jax.Array,
    normal: jax.Array,
    nbrs: NeighborList,
    params: SimParams,
) -> tuple[jax.Array, jax.Array]:
    """Ihmsen et al. 2010 frozen-particle position projection + friction
    (sphFluid.cl:824-887). Distances in sim units against the *static*
    boundary positions; r0 = h/2."""
    g = _gather_ids(nbrs)
    r0 = jnp.float32(params.r0)
    is_b_j = (ptype[g.j] == BOUNDARY_PARTICLE) & g.mask

    d = x_new[:, None, :] - pos0[g.j]
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    w = jnp.where(is_b_j, jnp.maximum(0.0, (r0 - dist) / r0), 0.0)
    n_ci = jnp.sum(normal[g.j] * w[..., None], axis=1)
    w_sum = jnp.sum(w, axis=1)
    w2_sum = jnp.sum(w * (r0 - dist) * is_b_j, axis=1)

    n_len2 = jnp.sum(n_ci * n_ci, axis=-1)
    has = n_len2 > 0.0
    n_len = jnp.sqrt(jnp.maximum(n_len2, 1e-30))
    dx = (n_ci / n_len[:, None]) * (w2_sum / jnp.maximum(w_sum, 1e-30))[:, None]
    x_out = jnp.where(has[:, None], x_new + dx, x_new)

    # Tangential friction: projection uses the *unnormalized* n_ci, exactly as
    # the reference does (sphFluid.cl:878-884).
    vn = jnp.sum(n_ci * v_new, axis=-1)
    fric = has & (vn < 0.0)
    v_fric = (v_new - n_ci * vn[:, None]) * jnp.float32(0.99)
    v_out = jnp.where(fric[:, None], v_fric, v_new)
    return x_out, v_out


def integrate(
    pos: jax.Array,
    vel: jax.Array,
    ptype: jax.Array,
    normal: jax.Array,
    a_ext: jax.Array,
    a_p: jax.Array,
    nbrs: NeighborList,
    params: SimParams,
) -> tuple[jax.Array, jax.Array]:
    """Semi-implicit Euler + box clamp + boundary response
    (sphFluid.cl:1684-1808). Returns (pos, vel) with boundary rows untouched."""
    dt = jnp.float32(params.time_step)
    pos_dt = jnp.float32(params.time_step * params.simulation_scale_inv)
    a = a_ext + a_p
    v_new = vel + dt * a
    x_new = pos + pos_dt * v_new

    lo = jnp.asarray(params.box_min, dtype=pos.dtype)
    hi = jnp.asarray(params.box_max, dtype=pos.dtype) - jnp.float32(1e-6)
    x_new = jnp.clip(x_new, lo, hi)

    v_avg = (vel + v_new) * 0.5
    x_new, v_avg = boundary_response(
        x_new, v_avg, pos, ptype, normal, nbrs, params
    )

    is_b = (ptype == BOUNDARY_PARTICLE)[:, None]
    return (
        jnp.where(is_b, pos, x_new),
        jnp.where(is_b, vel, v_avg),
    )
