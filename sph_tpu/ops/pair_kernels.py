"""Pallas TPU pair-interaction kernels — the fast path's hot ops.

Replaces both the neighbor-list build and every per-neighbor gather of the
reference pipeline (`/root/reference/src/sphFluid.cl`) with *blocked
all-pairs* passes over cell-sorted particles:

* particles are kept sorted by (x-major) cell id at h granularity;
* an "own" block is B=1024 consecutive sorted particles (dense, no padding);
* its interaction candidates are three **contiguous** slabs of the sorted
  array — the pencil bands (cy-1..cy+1) x (cz-1..cz+1) covering every cell
  within radius h of the block (x-major order makes each z-plane's band one
  run); slabs arrive via aligned DMA, so the TPU never issues a random
  gather;
* each pass recomputes masked pairwise terms on the VPU and reduces them;
  finding neighbors and using them fuse into the same pair mask.

Rationale: XLA gathers on TPU run at ~7.5 ns/element regardless of locality
(measured), which capped the gather-based pipeline at ~0.03M particle-steps/s;
dense pair math runs at VPU rate (a prototype density pass measured 8 ms for
233k particles vs 1173 ms for the gather-based neighbor search at 58k).

Layout notes (hard-won):
* pair tiles are [B own sublanes x ccol slab lanes]; own fields are (B, 1)
  columns, slab fields (1, ccol) rows;
* per-particle fields travel in row-major packs ``[128, n_alloc]`` so a slab
  chunk is ONE aligned 2-D DMA and each field is a free (1, ccol) row slice;
  ccol stays small because several [B, ccol] temporaries live at once;
* 1-D HBM buffers tile at 1024 elements: DMA offsets/sizes are 1024-aligned,
  hence B = 1024 and the aligned chunk windows; outputs are written back by
  DMA to 1-D [n_pad] buffers.

Semantic deviation from the reference (documented): the reference caps each
particle at the ~32 nearest neighbors via a histogram threshold
(`sphFluid.cl:207-329`); these kernels use *all* pairs within radius h.
Beyond-32 neighbors sit near q = 1 where every kernel term vanishes, so the
physical difference is a boundary-shell correction. The neighbor-list engine
(core/step.py) remains the exact-semantics implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1024
ALIGN = 1024

# main pack columns (time-t fields)
MAIN_COLS = 8
(PM_X, PM_Y, PM_Z, PM_VEX, PM_VEY, PM_VEZ, PM_RHO, PM_ISB) = range(8)

# iteration pack columns: time-t pos + predicted pos / (rho*, p)
ITER_COLS = 8

# boundary pack columns
BND_COLS = 8
(PB_X, PB_Y, PB_Z, PB_NX, PB_NY, PB_NZ, PB_ISB) = range(7)

# membrane pack columns: 7 triangles x (n, a) + x(t+1) + x(t)
MEM_COLS = 48
PMM_XN, PMM_YN, PMM_ZN = 42, 43, 44
PMM_XT, PMM_YT, PMM_ZT = 45, 46, 47


def _own_row(own_scr, a):
    """Own field a as a (B, 1) sublane column."""
    return own_scr[a, :].reshape(B, 1)


def _slab_col(slab_scr, a, col0, ccol):
    """Slab field a, cols [col0, col0+ccol), as a (1, ccol) lane row."""
    return slab_scr[a, pl.ds(col0, ccol)][None, :]


def _make_pass(kernel_body, *, own_cols, slab_cols, n_outputs, ccap, ccol,
               n_blocks, has_flags=False, interpret=False):
    """Build a jitted pair pass over [n_blocks] own blocks x 3 slab chunks.

    kernel_body(own_scr, slab_scr, ctx, accs) -> accs
      own_scr:  VMEM [B, own_cols]; slab_scr: VMEM [ccap, slab_cols]
      ctx: colg (ccol,1) global slab ids, base (ccol,1) validity,
           own_gid (1,B), col0 int
      accs: tuple of (1, B) accumulators.
    """
    n_prefetch = 4 if has_flags else 3

    def kernel(*refs):
        if has_flags:
            aoff, lo_t, hi_t, flags = refs[:4]
        else:
            aoff, lo_t, hi_t = refs[:3]
            flags = None
        own_h, slab_h = refs[n_prefetch:n_prefetch + 2]
        outs = refs[n_prefetch + 2:n_prefetch + 2 + n_outputs]
        own_scr, slab_scr, osem, ssem = refs[
            n_prefetch + 2 + n_outputs:
        ]

        b = pl.program_id(0)
        own_off = pl.multiple_of(b * B, ALIGN)

        def compute():
            # double-buffered slab chunks: chunk ci+1's DMA overlaps chunk
            # ci's pair math
            def slab_copy(ci, slot):
                off = pl.multiple_of(aoff[b, ci], ALIGN)
                return pltpu.make_async_copy(
                    slab_h.at[:, pl.ds(off, ccap)],
                    slab_scr.at[slot], ssem.at[slot],
                )

            cp_own = pltpu.make_async_copy(
                own_h.at[:, pl.ds(own_off, B)], own_scr, osem
            )
            cp_own.start()
            slab_copy(0, 0).start()
            cp_own.wait()
            own_gid = own_off + jax.lax.broadcasted_iota(
                jnp.int32, (B, 1), 0
            )

            accs = tuple(
                jnp.zeros((B, 1), jnp.float32) for _ in range(n_outputs)
            )
            for ci in range(3):
                slot = ci % 2
                if ci + 1 < 3:
                    slab_copy(ci + 1, (ci + 1) % 2).start()
                slab_copy(ci, slot).wait()
                off = pl.multiple_of(aoff[b, ci], ALIGN)
                lo = lo_t[b, ci]
                hi = hi_t[b, ci]
                view = slab_scr.at[slot]
                for col0 in range(0, ccap, ccol):
                    colg = (off + col0) + jax.lax.broadcasted_iota(
                        jnp.int32, (1, ccol), 1
                    )
                    base = (colg >= lo) & (colg < hi)
                    ctx = dict(colg=colg, base=base, own_gid=own_gid,
                               col0=col0)
                    accs = kernel_body(own_scr, view, ctx, accs)
            return accs

        if has_flags:
            zeros = tuple(
                jnp.zeros((B, 1), jnp.float32) for _ in range(n_outputs)
            )

            @pl.when(flags[b] != 0)
            def _():
                accs = compute()
                for k in range(n_outputs):
                    outs[k][:, :] = accs[k]

            @pl.when(flags[b] == 0)
            def _():
                for k in range(n_outputs):
                    outs[k][:, :] = zeros[k]
        else:
            accs = compute()
            for k in range(n_outputs):
                outs[k][:, :] = accs[k]

    # Packs must stay in HBM: the compiler would otherwise place small
    # inputs in VMEM, where dynamically-offset DMA slices can't be lowered.
    mspace = pl.ANY if interpret else pltpu.HBM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=mspace),  # own pack
            pl.BlockSpec(memory_space=mspace),  # slab pack
        ],
        out_specs=tuple(
            pl.BlockSpec((B, 1), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_outputs)
        ),
        scratch_shapes=(
            [pltpu.VMEM((own_cols, B), jnp.float32),
             pltpu.VMEM((2, slab_cols, ccap), jnp.float32)]
            + [pltpu.SemaphoreType.DMA,
               pltpu.SemaphoreType.DMA((2,))]
        ),
    )
    n_pad = n_blocks * B
    out_shape = tuple(
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)
        for _ in range(n_outputs)
    )

    def call(tables, own_pack, slab_pack):
        args = list(tables) + [own_pack, slab_pack]
        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(*args)
        if n_outputs == 1:
            return res[0].reshape(n_pad)
        return tuple(r.reshape(n_pad) for r in res)

    return call


def make_density_pass(*, ccap, ccol, n_blocks, inv_h2, c_rho,
                      interpret=False, **_):
    """rho_i = c_rho * max(1, sum poly6 over pairs q^2 <= 1)
    (sphFluid.cl:472-518, all-pairs form)."""

    def body(own, slab, ctx, accs):
        col0 = ctx["col0"]
        xo, yo, zo = (_own_row(own, PM_X), _own_row(own, PM_Y),
                      _own_row(own, PM_Z))
        sx = _slab_col(slab, PM_X, col0, ccol)
        sy = _slab_col(slab, PM_Y, col0, ccol)
        sz = _slab_col(slab, PM_Z, col0, ccol)
        dx, dy, dz = xo - sx, yo - sy, zo - sz
        q2 = (dx * dx + dy * dy + dz * dz) * inv_h2
        ok = ctx["base"] & (ctx["colg"] != ctx["own_gid"]) & (q2 <= 1.0)
        t = 1.0 - q2
        w = jnp.where(ok, t * t * t, 0.0)
        (acc,) = accs
        return (acc + jnp.sum(w, axis=1, keepdims=True),)

    raw = _make_pass(body, own_cols=MAIN_COLS, slab_cols=MAIN_COLS,
                     n_outputs=1, ccap=ccap, ccol=ccol, n_blocks=n_blocks,
                     interpret=interpret)

    def call(tables, main_pack):
        s = raw(tables, main_pack, main_pack)
        return c_rho * jnp.maximum(s, 1.0)

    return call


def make_visc_pass(*, ccap, ccol, n_blocks, inv_h2, interpret=False, **_):
    """Viscosity pair sums (sphFluid.cl:589-708), over q < 1 pairs:
    sum (ve_j - ve_i)(1-q)/rho_j. Boundary neighbors contribute wall normals
    as velocity (pack's VE columns pre-substituted)."""

    def body(own, slab, ctx, accs):
        col0 = ctx["col0"]
        xo, yo, zo = (_own_row(own, PM_X), _own_row(own, PM_Y),
                      _own_row(own, PM_Z))
        vxo, vyo, vzo = (_own_row(own, PM_VEX), _own_row(own, PM_VEY),
                         _own_row(own, PM_VEZ))
        sx = _slab_col(slab, PM_X, col0, ccol)
        sy = _slab_col(slab, PM_Y, col0, ccol)
        sz = _slab_col(slab, PM_Z, col0, ccol)
        dx, dy, dz = xo - sx, yo - sy, zo - sz
        q2 = (dx * dx + dy * dy + dz * dz) * inv_h2
        ok = ctx["base"] & (ctx["colg"] != ctx["own_gid"]) & (q2 < 1.0)

        q = jnp.sqrt(q2)
        rho_j = _slab_col(slab, PM_RHO, col0, ccol)
        wv = jnp.where(ok, (1.0 - q) / rho_j, 0.0)
        svx = _slab_col(slab, PM_VEX, col0, ccol)
        svy = _slab_col(slab, PM_VEY, col0, ccol)
        svz = _slab_col(slab, PM_VEZ, col0, ccol)

        vx, vy, vz = accs
        vx = vx + jnp.sum((svx - vxo) * wv, axis=1, keepdims=True)
        vy = vy + jnp.sum((svy - vyo) * wv, axis=1, keepdims=True)
        vz = vz + jnp.sum((svz - vzo) * wv, axis=1, keepdims=True)
        return vx, vy, vz

    return _make_pass(body, own_cols=MAIN_COLS, slab_cols=MAIN_COLS,
                      n_outputs=3, ccap=ccap, ccol=ccol, n_blocks=n_blocks,
                      interpret=interpret)


def make_surf_pass(*, ccap, ccol, n_blocks, inv_h2, interpret=False, **_):
    """Surface-tension pair sums (sphFluid.cl:662): sum (x_i - x_j) over
    q < 1 pairs."""

    def body(own, slab, ctx, accs):
        col0 = ctx["col0"]
        xo, yo, zo = (_own_row(own, PM_X), _own_row(own, PM_Y),
                      _own_row(own, PM_Z))
        sx = _slab_col(slab, PM_X, col0, ccol)
        sy = _slab_col(slab, PM_Y, col0, ccol)
        sz = _slab_col(slab, PM_Z, col0, ccol)
        dx, dy, dz = xo - sx, yo - sy, zo - sz
        q2 = (dx * dx + dy * dy + dz * dz) * inv_h2
        ok = ctx["base"] & (ctx["colg"] != ctx["own_gid"]) & (q2 < 1.0)
        okf = jnp.where(ok, 1.0, 0.0)

        stx, sty, stz = accs
        stx = stx + jnp.sum(dx * okf, axis=1, keepdims=True)
        sty = sty + jnp.sum(dy * okf, axis=1, keepdims=True)
        stz = stz + jnp.sum(dz * okf, axis=1, keepdims=True)
        return stx, sty, stz

    return _make_pass(body, own_cols=MAIN_COLS, slab_cols=MAIN_COLS,
                      n_outputs=3, ccap=ccap, ccol=ccol, n_blocks=n_blocks,
                      interpret=interpret)


def make_rho_star_pass(*, ccap, ccol, n_blocks, inv_h2, c_rho,
                       interpret=False, **_):
    """Predicted density (sphFluid.cl:982-1059): pair set = within h at
    time t (cached-neighbor semantics), contribution from predicted
    positions with q*^2 < 1 strict. Pack cols: 0-2 time-t pos,
    3-5 predicted pos."""

    def body(own, slab, ctx, accs):
        col0 = ctx["col0"]
        xo, yo, zo = _own_row(own, 0), _own_row(own, 1), _own_row(own, 2)
        xso, yso, zso = _own_row(own, 3), _own_row(own, 4), _own_row(own, 5)
        sx = _slab_col(slab, 0, col0, ccol)
        sy = _slab_col(slab, 1, col0, ccol)
        sz = _slab_col(slab, 2, col0, ccol)
        sxs = _slab_col(slab, 3, col0, ccol)
        sys_ = _slab_col(slab, 4, col0, ccol)
        szs = _slab_col(slab, 5, col0, ccol)

        dx, dy, dz = xo - sx, yo - sy, zo - sz
        q2t = (dx * dx + dy * dy + dz * dz) * inv_h2
        dxs, dys, dzs = xso - sxs, yso - sys_, zso - szs
        q2s = (dxs * dxs + dys * dys + dzs * dzs) * inv_h2
        ok = (ctx["base"] & (ctx["colg"] != ctx["own_gid"])
              & (q2t <= 1.0) & (q2s < 1.0))
        t = 1.0 - q2s
        w = jnp.where(ok, t * t * t, 0.0)
        (acc,) = accs
        return (acc + jnp.sum(w, axis=1, keepdims=True),)

    raw = _make_pass(body, own_cols=ITER_COLS, slab_cols=ITER_COLS,
                     n_outputs=1, ccap=ccap, ccol=ccol, n_blocks=n_blocks,
                     interpret=interpret)

    def call(tables, pack):
        s = raw(tables, pack, pack)
        return c_rho * jnp.maximum(s, 1.0)

    return call


def make_paccel_pass(*, ccap, ccol, n_blocks, inv_h2, inv_h, rho0_delta,
                     interpret=False, **_):
    """Pressure-force pair sums (sphFluid.cl:1101-1212): for 0 < q < 1
    pairs, term = (1-q)^2 * 0.5 * (p_i + p_j)/rho*_j, anti-clump
    substitution below q = 0.25; direction = unit(x_i - x_j).
    Pack cols: [x, y, z, rho*, p] (time-t positions)."""

    def body(own, slab, ctx, accs):
        col0 = ctx["col0"]
        xo, yo, zo = _own_row(own, 0), _own_row(own, 1), _own_row(own, 2)
        po = _own_row(own, 4)
        sx = _slab_col(slab, 0, col0, ccol)
        sy = _slab_col(slab, 1, col0, ccol)
        sz = _slab_col(slab, 2, col0, ccol)
        srho = _slab_col(slab, 3, col0, ccol)
        sp = _slab_col(slab, 4, col0, ccol)

        dx, dy, dz = xo - sx, yo - sy, zo - sz
        q2 = (dx * dx + dy * dy + dz * dz) * inv_h2
        ok = (ctx["base"] & (ctx["colg"] != ctx["own_gid"])
              & (q2 < 1.0) & (q2 > 0.0))
        q = jnp.sqrt(q2)
        one_m_q = 1.0 - q
        far = one_m_q * one_m_q * 0.5 * (po + sp)
        cm = 0.25 - q
        close = cm * cm * 0.5 * rho0_delta
        term = jnp.where(q < 0.25, close, far) / srho
        w = jnp.where(ok, term / (q + 1e-30) * inv_h, 0.0)
        ax, ay, az = accs
        ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
        ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
        az = az + jnp.sum(w * dz, axis=1, keepdims=True)
        return ax, ay, az

    return _make_pass(body, own_cols=ITER_COLS, slab_cols=ITER_COLS,
                      n_outputs=3, ccap=ccap, ccol=ccol, n_blocks=n_blocks,
                      interpret=interpret)


def make_boundary_pass(*, ccap, ccol, n_blocks, inv_h2, r0,
                       interpret=False, **_):
    """Ihmsen boundary-response pair sums (sphFluid.cl:824-887).

    own pack cols: [x_t, y_t, z_t, xn, yn, zn]; slab = boundary pack.
    Pair set: within h at time t AND slab is boundary; weights from the
    distance of the *new* own position to the boundary particle.
    Outputs: n_ci (3), w_sum, w2_sum."""

    def body(own, slab, ctx, accs):
        col0 = ctx["col0"]
        xo, yo, zo = _own_row(own, 0), _own_row(own, 1), _own_row(own, 2)
        xno, yno, zno = _own_row(own, 3), _own_row(own, 4), _own_row(own, 5)
        sx = _slab_col(slab, PB_X, col0, ccol)
        sy = _slab_col(slab, PB_Y, col0, ccol)
        sz = _slab_col(slab, PB_Z, col0, ccol)
        isb = _slab_col(slab, PB_ISB, col0, ccol)

        dx, dy, dz = xo - sx, yo - sy, zo - sz
        q2 = (dx * dx + dy * dy + dz * dz) * inv_h2
        ok = (ctx["base"] & (ctx["colg"] != ctx["own_gid"])
              & (q2 <= 1.0) & (isb > 0.0))

        dnx, dny, dnz = xno - sx, yno - sy, zno - sz
        dist = jnp.sqrt(dnx * dnx + dny * dny + dnz * dnz)
        w = jnp.where(ok, jnp.maximum(0.0, (r0 - dist) / r0), 0.0)
        nx_ = _slab_col(slab, PB_NX, col0, ccol)
        ny_ = _slab_col(slab, PB_NY, col0, ccol)
        nz_ = _slab_col(slab, PB_NZ, col0, ccol)

        ax, ay, az, ws, w2 = accs
        ax = ax + jnp.sum(w * nx_, axis=1, keepdims=True)
        ay = ay + jnp.sum(w * ny_, axis=1, keepdims=True)
        az = az + jnp.sum(w * nz_, axis=1, keepdims=True)
        ws = ws + jnp.sum(w, axis=1, keepdims=True)
        w2 = w2 + jnp.sum(w * (r0 - dist), axis=1, keepdims=True)
        return ax, ay, az, ws, w2

    return _make_pass(body, own_cols=ITER_COLS, slab_cols=BND_COLS,
                      n_outputs=5, ccap=ccap, ccol=ccol, n_blocks=n_blocks,
                      interpret=interpret)


def make_membrane_pass(*, ccap, ccol, n_blocks, inv_h2, r0,
                       interpret=False, **_):
    """Membrane interaction pair sums (sphFluid.cl:1369-1650).

    own pack cols: [x_t, y_t, z_t, xn, yn, zn]; slab = membrane pack: per
    particle 7 x (plane normal, ref point) at cols 6t..6t+5 (zeros when
    absent), cols 42-44 x(t+1), cols 45-47 x(t). Blocks without
    liquid-near-membrane work are skipped via the flags table.
    Outputs: n_ci (3), w_sum, w2_sum."""

    def body(own, slab, ctx, accs):
        col0 = ctx["col0"]
        xo, yo, zo = _own_row(own, 0), _own_row(own, 1), _own_row(own, 2)
        xno, yno, zno = _own_row(own, 3), _own_row(own, 4), _own_row(own, 5)
        stx = _slab_col(slab, PMM_XT, col0, ccol)
        sty = _slab_col(slab, PMM_YT, col0, ccol)
        stz = _slab_col(slab, PMM_ZT, col0, ccol)
        dtx, dty, dtz = xo - stx, yo - sty, zo - stz
        q2t = (dtx * dtx + dty * dty + dtz * dtz) * inv_h2
        ok = ctx["base"] & (ctx["colg"] != ctx["own_gid"]) & (q2t <= 1.0)

        navx = jnp.zeros((B, ccol), jnp.float32)
        navy = jnp.zeros((B, ccol), jnp.float32)
        navz = jnp.zeros((B, ccol), jnp.float32)
        cnt = jnp.zeros((B, ccol), jnp.float32)
        for t in range(7):
            ntx = _slab_col(slab, 6 * t + 0, col0, ccol)
            nty = _slab_col(slab, 6 * t + 1, col0, ccol)
            ntz = _slab_col(slab, 6 * t + 2, col0, ccol)
            atx = _slab_col(slab, 6 * t + 3, col0, ccol)
            aty = _slab_col(slab, 6 * t + 4, col0, ccol)
            atz = _slab_col(slab, 6 * t + 5, col0, ccol)
            s = ((xno - atx) * ntx + (yno - aty) * nty
                 + (zno - atz) * ntz)
            has_t = (ntx * ntx + nty * nty + ntz * ntz > 0.0) & (s != 0.0)
            sgn = jnp.where(has_t, jnp.sign(s), 0.0)
            navx = navx + sgn * ntx
            navy = navy + sgn * nty
            navz = navz + sgn * ntz
            cnt = cnt + jnp.where(has_t, 1.0, 0.0)

        inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
        is_entry = ok & (cnt > 0.0)

        sxn = _slab_col(slab, PMM_XN, col0, ccol)
        syn = _slab_col(slab, PMM_YN, col0, ccol)
        szn = _slab_col(slab, PMM_ZN, col0, ccol)
        dnx, dny, dnz = xno - sxn, yno - syn, zno - szn
        dist = jnp.sqrt(dnx * dnx + dny * dny + dnz * dnz)
        w = jnp.where(is_entry, jnp.maximum(0.0, (r0 - dist) / r0), 0.0)
        wc = w * inv_cnt
        ax, ay, az, ws, w2 = accs
        ax = ax + jnp.sum(wc * navx, axis=1, keepdims=True)
        ay = ay + jnp.sum(wc * navy, axis=1, keepdims=True)
        az = az + jnp.sum(wc * navz, axis=1, keepdims=True)
        ws = ws + jnp.sum(w, axis=1, keepdims=True)
        w2 = w2 + jnp.sum(w * (r0 - dist), axis=1, keepdims=True)
        return ax, ay, az, ws, w2

    return _make_pass(body, own_cols=ITER_COLS, slab_cols=MEM_COLS,
                      n_outputs=5, ccap=ccap, ccol=ccol, n_blocks=n_blocks,
                      has_flags=True, interpret=interpret)
