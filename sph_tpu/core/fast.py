"""The fast (Pallas) engine: one PCISPH step built on blocked pair kernels.

Same stage order and physics as :mod:`sph_tpu.core.step` (the exact-semantics
neighbor-list engine), recomposed for TPU speed-of-light:

* particles are re-sorted by h-granularity cell id each step (argsort — fast)
  and the whole step runs in sorted space; original order is restored once at
  the end (springs and membrane triangle ids stay in original/absolute space);
* every per-neighbor reduction is a blocked all-pairs Pallas pass over
  contiguous sorted slabs (see ops/pair_kernels.py) — no gathers, no
  neighbor lists;
* elastic/muscle forces keep the (small, irregular) spring-graph gather in
  XLA original space and scatter into the sorted accumulator.

Documented deviation from the reference: no 32-neighbor cap (all pairs
within radius h interact; the reference's histogram cap keeps the ~32
nearest, sphFluid.cl:207-329). Near-cap neighbors sit at q ~ 1 where all
kernel terms vanish, so trajectories track the exact engine closely; the
exact engine remains available for parity validation.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SimParams
from ..constants import BOUNDARY_PARTICLE, LIQUID_PARTICLE
from ..models import muscle
from ..ops import pair_kernels as pk
from ..ops import vec3
from .elastic import elastic_accel
from .state import FluidState, Membranes, Springs
from .step import SceneLayout

B = pk.B
ALIGN = pk.ALIGN


@dataclasses.dataclass(frozen=True)
class FastConfig:
    """Static shapes of the fast engine (hashable; jit-static)."""

    n_particles: int
    n_blocks: int
    ccap: int       # slab chunk capacity (1024-aligned)
    ccol: int       # pair-tile column width
    dims: tuple[int, int, int]  # h-granularity grid dims
    interpret: bool = False

    @property
    def n_pad(self) -> int:
        return self.n_blocks * B

    @property
    def n_alloc(self) -> int:
        return self.n_pad + self.ccap

    @property
    def n_pencils(self) -> int:
        return self.dims[1] * self.dims[2]


def compute_fast_config(
    pos: np.ndarray,
    params: SimParams,
    margin: float = 1.4,
    interpret: bool | None = None,
) -> FastConfig:
    """Measure chunk capacity on the initial scene (with safety margin)."""
    cell = params.h
    nx = int((params.x_max - params.x_min) / cell) + 1
    ny = int((params.y_max - params.y_min) / cell) + 1
    nz = int((params.z_max - params.z_min) / cell) + 1
    n = len(pos)
    c = np.clip(((pos - np.asarray(params.box_min)) / cell).astype(np.int64),
                0, [nx - 1, ny - 1, nz - 1])
    pencil = c[:, 1] + ny * c[:, 2]
    cid = c[:, 0] + nx * pencil
    order = np.argsort(cid, kind="stable")
    pencil_s = pencil[order]
    n_pencils = ny * nz
    pstart = np.searchsorted(pencil_s, np.arange(n_pencils + 1))

    nb = -(-n // B)
    first = pencil_s[np.minimum(np.arange(nb) * B, n - 1)]
    last = pencil_s[np.minimum(np.arange(nb) * B + B - 1, n - 1)]
    cmax = 0
    prev_hi = np.zeros(nb, np.int64)
    for dz in (-1, 0, 1):
        lo = np.clip(first + dz * ny - 1, 0, n_pencils)
        hi = np.clip(last + dz * ny + 2, 0, n_pencils)
        lo = np.maximum(lo, prev_hi)
        hi = np.maximum(hi, lo)
        prev_hi = hi
        off = pstart[lo]
        end = pstart[hi]
        aligned = (off // ALIGN) * ALIGN
        cmax = max(cmax, int((end - aligned).max()))
    ccap = max(ALIGN, -(-int(cmax * margin) // ALIGN) * ALIGN)
    if interpret is None:
        # the axon PJRT plugin reports platform "axon" for a real TPU chip
        dev = jax.devices()[0]
        interpret = not (
            jax.default_backend() in ("tpu", "axon")
            or "TPU" in getattr(dev, "device_kind", "")
        )
    return FastConfig(
        n_particles=n, n_blocks=nb, ccap=ccap,
        ccol=min(512, ccap), dims=(nx, ny, nz), interpret=interpret,
    )


def _chunk_tables(pencil_s, cfg: FastConfig):
    """Per-block slab chunk windows (aligned offset, exact lo/hi) + pencil
    ranges for flags. All shapes static."""
    n, nb = cfg.n_particles, cfg.n_blocks
    ny = cfg.dims[1]
    npen = cfg.n_pencils
    pstart = jnp.searchsorted(
        pencil_s, jnp.arange(npen + 1, dtype=pencil_s.dtype), side="left"
    ).astype(jnp.int32)

    bidx = jnp.arange(nb, dtype=jnp.int32)
    first = pencil_s[jnp.minimum(bidx * B, n - 1)]
    last = pencil_s[jnp.minimum(bidx * B + B - 1, n - 1)]

    los, his, aligneds, plos, phis = [], [], [], [], []
    prev_hi = jnp.zeros(nb, jnp.int32)
    overflow = jnp.zeros((), jnp.int32)
    for dz in (-1, 0, 1):
        lo_p = jnp.clip(first + dz * ny - 1, 0, npen)
        hi_p = jnp.clip(last + dz * ny + 2, 0, npen)
        lo_p = jnp.maximum(lo_p, prev_hi)
        hi_p = jnp.maximum(hi_p, lo_p)
        prev_hi = hi_p
        off = pstart[lo_p]
        end = pstart[hi_p]
        aligned = (off // ALIGN) * ALIGN
        overflow = overflow + jnp.sum(
            jnp.maximum(end - aligned - cfg.ccap, 0)
        )
        end = jnp.minimum(end, aligned + cfg.ccap)
        los.append(off)
        his.append(end)
        aligneds.append(aligned)
        plos.append(lo_p)
        phis.append(hi_p)

    tables = (
        jnp.stack(aligneds, 1), jnp.stack(los, 1), jnp.stack(his, 1)
    )
    pencil_ranges = (jnp.stack(plos, 1), jnp.stack(phis, 1))
    return tables, pstart, pencil_ranges, overflow


def _pad_field(a, cfg: FastConfig, fill=0.0):
    pad = cfg.n_alloc - a.shape[0]
    return jnp.concatenate(
        [a, jnp.full((pad,), fill, a.dtype)]
    )


def _pack(fields, n_rows, cfg: FastConfig):
    """Stack fields into a row-major [n_rows, n_alloc] pack (DMA slices are
    full-rows x aligned column windows; n_rows stays a multiple of 8)."""
    mat = jnp.stack(fields, axis=0)
    if len(fields) < n_rows:
        mat = jnp.concatenate(
            [mat,
             jnp.zeros((n_rows - len(fields), cfg.n_alloc), jnp.float32)],
            axis=0,
        )
    return mat


def make_fast_step(params: SimParams, layout: SceneLayout, cfg: FastConfig):
    """Build the jitted fast step(state, springs, membranes) -> state."""
    inv_h2 = np.float32(1.0 / (params.h * params.h))
    inv_h = np.float32(1.0 / params.h)
    c_rho = np.float32(params.c_rho)
    r0 = np.float32(params.r0)
    kw = dict(ccap=cfg.ccap, ccol=cfg.ccol, n_blocks=cfg.n_blocks,
              n_alloc=cfg.n_alloc, inv_h2=inv_h2, interpret=cfg.interpret)
    density_pass = pk.make_density_pass(c_rho=c_rho, **kw)
    visc_pass = pk.make_visc_pass(**kw)
    surf_pass = pk.make_surf_pass(**kw)
    rho_star_pass = pk.make_rho_star_pass(c_rho=c_rho, **kw)
    paccel_pass = pk.make_paccel_pass(
        inv_h=inv_h, rho0_delta=np.float32(params.rho0 * params.delta), **kw
    )
    boundary_pass = pk.make_boundary_pass(r0=r0, **kw)
    membrane_pass = pk.make_membrane_pass(r0=r0, **kw)

    n = cfg.n_particles
    nx, ny, nz = cfg.dims
    far = np.float32(
        max(params.x_max, params.y_max, params.z_max) + 100.0 * params.h
    )

    dt = np.float32(params.time_step)
    pos_dt = np.float32(params.time_step * params.simulation_scale_inv)
    rho0 = np.float32(params.rho0)
    delta_c = np.float32(params.delta)
    c_press = np.float32(params.c_press)
    c_visc = np.float32(params.c_visc)
    c_surf = np.float32(params.c_surf)
    gx, gy, gz = (np.float32(g) for g in params.gravity)
    lo_box = params.box_min
    hi_box = params.box_max

    def step(state: FluidState, springs: Springs, membranes: Membranes
             ) -> FluidState:
        pos = vec3.split(state.pos)
        vel = vec3.split(state.vel)
        nrm = vec3.split(state.normal)
        is_b = state.ptype == BOUNDARY_PARTICLE
        is_liq = state.ptype == LIQUID_PARTICLE

        # ---- sort by h-cell id (binning matches grid.cell_coords_of:
        # subtract box_min before scaling) ----
        cell = jnp.float32(1.0 / params.h)
        bx, by, bz = (jnp.float32(b) for b in params.box_min)
        cx = jnp.clip(((pos.x - bx) * cell).astype(jnp.int32), 0, nx - 1)
        cy = jnp.clip(((pos.y - by) * cell).astype(jnp.int32), 0, ny - 1)
        cz = jnp.clip(((pos.z - bz) * cell).astype(jnp.int32), 0, nz - 1)
        pencil = cy + ny * cz
        cid = cx + nx * pencil
        order = jnp.argsort(cid, stable=True).astype(jnp.int32)
        inv = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        pencil_s = pencil[order]
        tables, pstart, pranges, overflow = _chunk_tables(pencil_s, cfg)
        del overflow  # recomputable via chunk_overflow() diagnostics

        def srt(a, fill=0.0):
            return _pad_field(a[order], cfg, fill)

        xs = srt(pos.x, far)
        ys = srt(pos.y, far)
        zs = srt(pos.z, far)
        isb_s = srt(is_b.astype(jnp.float32))
        liq_s = srt(is_liq.astype(jnp.float32))
        nxs = srt(nrm.x)
        nys = srt(nrm.y)
        nzs = srt(nrm.z)
        # boundary rows carry the wall normal as "velocity" (sphFluid.cl:860)
        vxs = jnp.where(isb_s > 0, nxs, srt(vel.x))
        vys = jnp.where(isb_s > 0, nys, srt(vel.y))
        vzs = jnp.where(isb_s > 0, nzs, srt(vel.z))

        # ---- density ----
        main0 = _pack([xs, ys, zs, vxs, vys, vzs], pk.MAIN_COLS, cfg)
        rho_s = _pad_field(
            density_pass(tables, main0)[: cfg.n_pad], cfg, 1.0
        )[: cfg.n_alloc]
        rho_s = jnp.where(rho_s <= 0, 1.0, rho_s)  # padding guard

        # ---- external forces ----
        main1 = _pack(
            [xs, ys, zs, vxs, vys, vzs, rho_s, isb_s],
            pk.MAIN_COLS, cfg,
        )
        vx, vy, vz = visc_pass(tables, main1, main1)
        stx, sty, stz = surf_pass(tables, main1, main1)
        own_rho = rho_s[: cfg.n_pad]
        not_b = (isb_s[: cfg.n_pad] == 0).astype(jnp.float32)
        aex = (c_visc * vx / own_rho + c_surf * stx + gx) * not_b
        aey = (c_visc * vy / own_rho + c_surf * sty + gy) * not_b
        aez = (c_visc * vz / own_rho + c_surf * stz + gz) * not_b

        # ---- elastic + muscle forces (original space -> sorted scatter) ----
        if springs.n_elastic > 0:
            ae = elastic_accel(pos, springs, state.muscle_activation, params)
            rows_sorted = inv[springs.row_ids]
            aex = aex.at[rows_sorted].add(ae.x)
            aey = aey.at[rows_sorted].add(ae.y)
            aez = aez.at[rows_sorted].add(ae.z)

        # ---- PCISPH prediction-correction ----
        p_s = jnp.zeros(cfg.n_pad, jnp.float32)
        apx = jnp.zeros(cfg.n_pad, jnp.float32)
        apy = jnp.zeros(cfg.n_pad, jnp.float32)
        apz = jnp.zeros(cfg.n_pad, jnp.float32)
        own_x = xs[: cfg.n_pad]
        own_y = ys[: cfg.n_pad]
        own_z = zs[: cfg.n_pad]
        own_vx = vxs[: cfg.n_pad]
        own_vy = vys[: cfg.n_pad]
        own_vz = vzs[: cfg.n_pad]
        bmask = isb_s[: cfg.n_pad] > 0

        for _ in range(params.n_pcisph_iters):
            xst = jnp.where(bmask, own_x, own_x + pos_dt * (own_vx + dt * apx))
            yst = jnp.where(bmask, own_y, own_y + pos_dt * (own_vy + dt * apy))
            zst = jnp.where(bmask, own_z, own_z + pos_dt * (own_vz + dt * apz))
            iter_pack = _pack(
                [xs, ys, zs,
                 _pad_field(xst, cfg, far), _pad_field(yst, cfg, far),
                 _pad_field(zst, cfg, far)],
                8, cfg,
            )
            rho_star = rho_star_pass(tables, iter_pack)
            p_s = p_s + jnp.maximum(0.0, (rho_star - rho0) * delta_c)
            pa_pack = _pack(
                [xs, ys, zs,
                 _pad_field(jnp.maximum(rho_star, 1.0), cfg, 1.0),
                 _pad_field(p_s, cfg)],
                8, cfg,
            )
            fx, fy, fz = paccel_pass(tables, pa_pack, pa_pack)
            coef = jnp.where(bmask, 0.0, c_press / rho_star)
            apx, apy, apz = coef * fx, coef * fy, coef * fz

        # ---- integrate ----
        vnx = own_vx + dt * (aex + apx)
        vny = own_vy + dt * (aey + apy)
        vnz = own_vz + dt * (aez + apz)
        xn = jnp.clip(own_x + pos_dt * vnx,
                      np.float32(lo_box[0]), np.float32(hi_box[0] - 1e-6))
        yn = jnp.clip(own_y + pos_dt * vny,
                      np.float32(lo_box[1]), np.float32(hi_box[1] - 1e-6))
        zn = jnp.clip(own_z + pos_dt * vnz,
                      np.float32(lo_box[2]), np.float32(hi_box[2] - 1e-6))
        vax = (own_vx + vnx) * 0.5
        vay = (own_vy + vny) * 0.5
        vaz = (own_vz + vnz) * 0.5

        # boundary response
        own_pack = _pack(
            [xs, ys, zs, _pad_field(xn, cfg, far),
             _pad_field(yn, cfg, far), _pad_field(zn, cfg, far)],
            8, cfg,
        )
        bnd_pack = _pack(
            [xs, ys, zs, nxs, nys, nzs, isb_s], pk.BND_COLS, cfg
        )
        ncx, ncy, ncz, wsum, w2sum = boundary_pass(
            tables, own_pack, bnd_pack
        )
        nlen2 = ncx * ncx + ncy * ncy + ncz * ncz
        has = nlen2 > 0
        coef = jnp.where(
            has,
            jax.lax.rsqrt(jnp.maximum(nlen2, 1e-30))
            * w2sum / jnp.maximum(wsum, 1e-30),
            0.0,
        )
        xn = xn + ncx * coef
        yn = yn + ncy * coef
        zn = zn + ncz * coef
        vn_dot = ncx * vax + ncy * vay + ncz * vaz
        fric = has & (vn_dot < 0)
        vax = jnp.where(fric, (vax - ncx * vn_dot) * 0.99, vax)
        vay = jnp.where(fric, (vay - ncy * vn_dot) * 0.99, vay)
        vaz = jnp.where(fric, (vaz - ncz * vn_dot) * 0.99, vaz)

        # ---- membranes ----
        if membranes.n_tris > 0:
            e0, e1 = layout.elastic_range
            # triangle unit normals + ref vertex from post-integrate positions
            vidx = inv[membranes.tris]  # [M,3] sorted rows
            def at_new(rows):
                return (xn[rows], yn[rows], zn[rows])
            ax_, ay_, az_ = at_new(vidx[:, 0])
            bx_, by_, bz_ = at_new(vidx[:, 1])
            cx_, cy_, cz_ = at_new(vidx[:, 2])
            ux, uy, uz = bx_ - ax_, by_ - ay_, bz_ - az_
            wx, wy, wz = cx_ - ax_, cy_ - ay_, cz_ - az_
            tnx = uy * wz - uz * wy
            tny = uz * wx - ux * wz
            tnz = ux * wy - uy * wx
            tl2 = tnx * tnx + tny * tny + tnz * tnz
            til = jnp.where(tl2 > 0, jax.lax.rsqrt(jnp.maximum(tl2, 1e-30)),
                            0.0)
            tnx, tny, tnz = tnx * til, tny * til, tnz * til

            # pack rows for elastic particles: 7 x (n, a)
            pt = membranes.particle_tris[e0:e1]          # [Ne,7]
            t_ok = pt >= 0
            t_safe = jnp.maximum(pt, 0)
            zero = jnp.zeros_like(t_safe, jnp.float32)
            fields = []
            for tr in range(7):
                ti = t_safe[:, tr]
                m = t_ok[:, tr]
                fields += [
                    jnp.where(m, tnx[ti], 0.0), jnp.where(m, tny[ti], 0.0),
                    jnp.where(m, tnz[ti], 0.0),
                    jnp.where(m, ax_[ti], 0.0), jnp.where(m, ay_[ti], 0.0),
                    jnp.where(m, az_[ti], 0.0),
                ]
            tri_mat = jnp.stack(fields, axis=0)          # [42, Ne]
            erows = inv[jnp.arange(e0, e1)]
            mem_pack = jnp.zeros((pk.MEM_COLS, cfg.n_alloc), jnp.float32)
            mem_pack = mem_pack.at[:42, erows].set(tri_mat)
            mem_pack = mem_pack.at[pk.PMM_XN].set(_pad_field(xn, cfg, far))
            mem_pack = mem_pack.at[pk.PMM_YN].set(_pad_field(yn, cfg, far))
            mem_pack = mem_pack.at[pk.PMM_ZN].set(_pad_field(zn, cfg, far))
            mem_pack = mem_pack.at[pk.PMM_XT].set(xs)
            mem_pack = mem_pack.at[pk.PMM_YT].set(ys)
            mem_pack = mem_pack.at[pk.PMM_ZT].set(zs)

            # per-block skip flags: own has liquid AND slab overlaps pencils
            # containing membrane elastics
            has_mem_orig = jnp.zeros(n, jnp.float32).at[
                jnp.arange(e0, e1)
            ].set((pt >= 0).any(axis=1).astype(jnp.float32))
            hm_s = has_mem_orig[order]
            seg = jax.ops.segment_sum(
                hm_s, pencil_s, num_segments=cfg.n_pencils
            )
            csum = jnp.concatenate(
                [jnp.zeros(1, seg.dtype), jnp.cumsum(seg)]
            )
            plo, phi = pranges
            chunk_mem = (csum[phi] - csum[plo]).sum(axis=1) > 0
            own_liq = (
                liq_s[: cfg.n_pad].reshape(cfg.n_blocks, B).max(axis=1) > 0
            )
            flags = (chunk_mem & own_liq).astype(jnp.int32)

            mnx, mny, mnz, mws, mw2 = membrane_pass(
                (tables[0], tables[1], tables[2], flags),
                own_pack, mem_pack,
            )
            ml2 = mnx * mnx + mny * mny + mnz * mnz
            mhas = (ml2 > 0) & (liq_s[: cfg.n_pad] > 0)
            mcoef = jnp.where(
                mhas,
                jax.lax.rsqrt(jnp.maximum(ml2, 1e-30))
                * mw2 / jnp.maximum(mws, 1e-30),
                0.0,
            )
            xn = xn + mnx * mcoef
            yn = yn + mny * mcoef
            zn = zn + mnz * mcoef

        # ---- unsort + write back ----
        def unsort(a_sorted):
            return jnp.zeros(n, jnp.float32).at[order].set(a_sorted[:n])

        new_pos = vec3.V3(unsort(xn), unsort(yn), unsort(zn))
        new_vel = vec3.V3(unsort(vax), unsort(vay), unsort(vaz))
        new_pos = new_pos.where(~is_b, pos)
        new_vel = new_vel.where(~is_b, vel)

        if layout.muscle_model:
            activation = muscle.next_activation(state.step)
        else:
            activation = state.muscle_activation

        return FluidState(
            pos=vec3.merge(new_pos),
            vel=vec3.merge(new_vel),
            ptype=state.ptype,
            normal=state.normal,
            muscle_activation=activation,
            step=state.step + 1,
        )

    return step


def make_fast_multi_step(params, layout, cfg, n_steps: int = 1):
    step = make_fast_step(params, layout, cfg)

    @jax.jit
    def run(state, springs, membranes):
        def body(s, _):
            return step(s, springs, membranes), None

        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    return run


def chunk_overflow(pos: np.ndarray, params: SimParams, cfg: FastConfig) -> int:
    """Diagnostic: candidates beyond the slab window capacity at the given
    positions (0 = every pair within h was considered). The step clamps the
    window silently, reference-style truncation; this surfaces it."""
    import jax.numpy as jnp
    nx, ny, nz = cfg.dims
    cell = 1.0 / params.h
    c = np.clip(((np.asarray(pos) - np.asarray(params.box_min)) * cell)
                .astype(np.int32), 0, [nx - 1, ny - 1, nz - 1])
    pencil = c[:, 1] + ny * c[:, 2]
    cid = c[:, 0] + nx * pencil
    order = np.argsort(cid, kind="stable")
    pencil_s = jnp.asarray(pencil[order].astype(np.int32))
    _, _, _, overflow = _chunk_tables(pencil_s, cfg)
    return int(overflow)
