"""Pallas TPU pair-interaction kernels — the fast path's hot ops.

Replaces both the neighbor-list build and every per-neighbor gather of the
reference pipeline (`/root/reference/src/sphFluid.cl`) with *blocked
all-pairs* passes over cell-sorted particles:

* particles are kept sorted by cell id at h granularity in z-major /
  x-pencil / y-run order (a pencil = one vertical column of cells; y is the
  shortest occupied axis of the reference world box, so pencils are short
  and interaction windows tight);
* an "own" block is B consecutive sorted particles (dense, no padding);
* its interaction candidates are three **contiguous** windows of the sorted
  array — the pencil bands (z-1, z, z+1) x (x span +- 1) covering every cell
  within radius h of the block — streamed through VMEM as ``ccol``-wide
  tiles with double-buffered DMA and a *dynamic* trip count, so each block
  pays for its actual window, not a global worst case;
* windows are exact AT SORT TIME: there is no slab capacity and nothing
  is ever truncated (the round-1 ``ccap`` clamp is gone by construction).
  They have zero Verlet skin, so a pair entering reach h between resorts
  is missed until the next resort — a smooth q~1 boundary perturbation,
  quantified in BASELINE.md "window staleness" and surfaced per resort
  period by the Simulator as ``window_drift_h`` (resort_every=1 restores
  per-step-exact neighbor semantics);
* pair distances and weights run on the VPU in full f32 (direct
  differences — no |a|^2-2ab+|b|^2 cancellation); every directional
  reduction ``sum_j w_ij * f_j`` runs on the MXU as one
  ``W @ F^T`` contraction, with coordinate reductions centered on the
  tile's first entry to keep the dot well-conditioned.

MASKLESS INVARIANT (r3): the table builders (core.fast._window_tables /
_tile_chunks) emit tiles that are *disjoint and covering* per block — every
in-window column appears in exactly one tile. The kernels therefore apply
NO window-validity test per pair:

* any real column a tile covers beyond the pencil-band window is >= h away
  from every own particle at sort time (the bands' +-1-pencil / +-1-row
  margin is exactly the h reach in x and z), where every pair term already
  vanishes (poly6/visc weights hit 0 at q = 1; boundary/membrane weights
  reach only r0 = h/2 on post-step distances);
* pad columns carry ``far`` positions (and zero flags), excluded the same
  way — the caller must pin pad/phantom OWN rows (fast.py pads the
  boundary flag with 1 so they integrate as walls);
* self-interaction is handled per pass: density/rho* subtract the exact
  self term (q = 0 -> poly6 weight exactly 1), the viscosity/surface sums
  cancel the self term analytically, pressure/spring weights carry a
  q^2 > 0 factor.

This removes the per-pair window-AND + self-compare (the dominant
non-arithmetic VPU ops of the light passes) and the per-tile column-id
iota build.

Layout notes (hard-won):
* ALL field packs are column-major ``[cols, n_alloc]`` — a slab tile and an
  own block are single aligned 2-D DMAs and each field a natural
  ``(1, ccol)`` / ``(1, block)`` lane row; own fields that enter per-pair
  broadcasts are flipped to ``(block, 1)`` once per block by a single
  identity matmul on the MXU (Mosaic has no cheap sublane<->lane relayout);
* pair tiles are [block own sublanes x ccol slab lanes]; accumulators are
  ``(1, block)`` lane rows produced directly by the MXU reduction
  ``dot_general(F (k, ccol), W (block, ccol))`` so outputs are written as
  contiguous ``(1, block)`` rows of a ``[n_blocks, block]`` buffer —
  ``(block, 1)`` writes into a lane-padded ``[n_pad, 1]`` buffer cost
  ~2.3 ms per output per pass (measured), this layout makes them free.

Semantic deviation from the reference (documented): the reference caps each
particle at the ~32 nearest neighbors via a histogram threshold
(`sphFluid.cl:207-329`); these kernels use *all* pairs within radius h.
Beyond-32 neighbors sit near q = 1 where every kernel term vanishes, so the
physical difference is a boundary-shell correction. The neighbor-list engine
(core/step.py) remains the exact-semantics implementation.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 128  # lane alignment of slab-tile DMA offsets

def _depth() -> int:
    """Slab-tile DMA ring depth (slots; depth-1 tiles in flight). 8-16 KB
    tile DMAs cannot hide their issue latency behind ~0.4 us of tile
    compute at depth 2; the r4 on-chip sweep measured the resulting
    per-tile stalls at ~42% of step time. Read at pass-BUILD time so
    on-chip sweeps can vary it between configs in one process."""
    return max(2, int(os.environ.get("SPH_TPU_DMA_DEPTH", "6")))


def _tile_cap(ccol: int) -> int:
    """Average per-block capacity of the flat tile table (mean tiles/block
    measured 8.73 at ccol=256 / 16.3 at ccol=128 on the worm — ~2.7x
    headroom, scaled inversely with tile width)."""
    return max(4, 6144 // ccol)


def _flat_tile_tables(tables, ccol, n_blocks, cap):
    """Legacy 6-tuple chunk tables -> (flat, gts, own_base) for the flat
    tile ring. flat[t] = slab column offset of global tile t (128-aligned);
    gts[b] = first global tile of block b (gts[n_blocks] = total tiles).
    Pure vector ops (CSE'd across a step's passes). Tiles beyond the
    static caps (per-block smax, total cap) would be silently dropped —
    core.fast surfaces `tile_overflow` in the resort diagnostics so that
    can never pass unnoticed."""
    aln, lo, hi, s0, cnt, ob = tables
    del lo, hi
    smax = max(8, 16384 // ccol)
    s = jnp.arange(smax, dtype=jnp.int32)[None, :]
    b3 = jnp.arange(n_blocks, dtype=jnp.int32)[:, None] * 3
    s0r = s0.reshape(n_blocks, 3)
    c = b3 + ((s >= s0r[:, 1:2]).astype(jnp.int32)
              + (s >= s0r[:, 2:3]).astype(jnp.int32))
    off = aln[c] + (s - s0[c]) * ccol
    gts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)]
    )
    idx = jnp.where(s < cnt[:, None], gts[:-1, None] + s, cap)
    flat = jnp.zeros(cap + 1, jnp.int32).at[idx.reshape(-1)].set(
        off.reshape(-1), mode="drop"
    )[:cap]
    return flat, gts, ob

# main pack columns (time-t fields)
MAIN_COLS = 8
(PM_X, PM_Y, PM_Z, PM_VEX, PM_VEY, PM_VEZ, PM_RHO, PM_ISB) = range(8)

# iteration packs
ITER_COLS = 3      # [x*, y*, z*] (predicted positions only)
PACC_COLS = 5      # [x, y, z, rho*, p]

# boundary pack columns
BND_COLS = 7
(PB_X, PB_Y, PB_Z, PB_NX, PB_NY, PB_NZ, PB_ISB) = range(7)

# own pack for the post-integrate passes: [x_t, y_t, z_t, xn, yn, zn]
OWN_COLS = 6

# membrane pack columns: 7 triangles x (n, a) + x(t+1) + x(t)
MEM_COLS = 48
PMM_XN, PMM_YN, PMM_ZN = 42, 43, 44
PMM_XT, PMM_YT, PMM_ZT = 45, 46, 47


_DIMS_T = (((1,), (1,)), ((), ()))


def _dd(a, b, dims=_DIMS_T):
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _bsplit(v):
    """2-way bf16 split: v == hi + lo to ~1.6e-5 relative, both parts
    exactly bf16-representable."""
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (v - hi).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, lo


def _dotT(a, b, exact_a=False, exact_b=False):
    """a [m, k] . b [n, k] -> [m, n] (contract trailing dims on the MXU)
    at near-f32 precision via operand splitting.

    Precision here is load-bearing: with Mosaic's default single bf16
    pass (~4e-3 relative on the operands) the spring pass's huge weights
    times centered positions cancel catastrophically — a systematic ~5%
    force error on every spring tore the worm apart within 500 steps
    (r2) — and even density's positive sums lose digits against the
    small (rho - rho0) pressure signal. Mosaic supports only DEFAULT and
    HIGHEST (6 passes, measured ~21% of the whole step); splitting each
    inexact operand 2-way into exactly-bf16 parts and dropping the lo*lo
    term gives ~3e-5 relative in 3 DEFAULT passes (2 when one operand is
    already exactly bf16-representable: exact_a for an all-ones row,
    exact_b for a {0,1} weight matrix — Mosaic's operand downconvert is
    then lossless and the big-matrix split is skipped entirely)."""
    if exact_a:
        bh, bl = _bsplit(b)
        return _dd(a, bh) + _dd(a, bl)
    ah, al = _bsplit(a)
    if exact_b:
        return _dd(ah, b) + _dd(al, b)
    bh, bl = _bsplit(b)
    return _dd(ah, bh) + (_dd(ah, bl) + _dd(al, bh))


def _srow(slab, a):
    """Slab field a as a (1, ccol) lane row."""
    return slab[a:a + 1, :]


def _lsum(w, f=None):
    """MXU reduction over the slab axis: sum_j f[k, j] * w[i, j] as a
    (k, block) lane-row matrix; f = ones when omitted (plain w row-sums)."""
    if f is None:
        return _dotT(jnp.ones((1, w.shape[1]), jnp.float32), w,
                     exact_a=True)
    return _dotT(f, w)


def _wsum3(w, slab, row0, own3=None, exact_w=False, round_w=False):
    """MXU reduction sum_j w_ij * (f_j - c) for the 3 slab rows starting at
    row0, centered on the tile's first column for f32 conditioning; if
    own3 = [(1, block)] x 3 lane rows is given, returns
    sum_j w_ij * (own - f_j) instead. Returns a list of 3 (1, block) rows.

    ONE dot per call: the plain row-sum of w rides along as a fourth
    (all-ones) row of the field matrix instead of a second dot — per-tile
    MXU issues are a measured cost driver at these tiny shapes.
    exact_w skips the bf16 split of w (pass it only for exactly-bf16
    weight matrices, e.g. {0,1} indicators). round_w rounds w to bf16
    instead of splitting it (2 dot passes instead of 3): the FIELD
    operand stays exactly split, so the error is a ~4e-3 perturbation of
    the pair WEIGHT only — safe where w is a smooth positive kernel
    factor with no cancellation amplification (pressure/viscosity/
    boundary weights; w_ij == w_ji bitwise, so pair antisymmetry and
    momentum are preserved) and NOT for the spring pass, whose (r - rest)
    cancellation amplified exactly this rounding ~100x in round 2.
    """
    out, _ = _wsum3_rw(w, slab, row0, own3, exact_w, round_w)
    return out


def _wsum3_rw(w, slab, row0, own3=None, exact_w=False, round_w=False):
    """_wsum3 that also returns the plain row-sum of w (still one dot)."""
    f = slab[row0:row0 + 3, :]                  # (3, ccol)
    c = slab[row0:row0 + 3, 0:1]                # (3, 1) tile-local center
    ones = jnp.ones((1, w.shape[1]), jnp.float32)
    fm = jnp.concatenate([f - c, ones], axis=0)  # (4, ccol)
    if round_w and not exact_w:
        w = w.astype(jnp.bfloat16).astype(jnp.float32)
        exact_w = True
    s = _dotT(fm, w, exact_b=exact_w)            # (4, block)
    rw = s[3:4, :]
    out = []
    for k in range(3):
        sk = s[k:k + 1, :]
        ck = c[k:k + 1, 0:1]
        if own3 is None:
            out.append(sk + ck * rw)
        else:
            out.append((own3[k] - ck) * rw - sk)
    return out, rw


def _wsum3c_rw(w, slab, row0, own3=None, exact_w=False, round_w=False):
    """Column-major `_wsum3_rw`: same reductions, but the weight matrix is
    the FIRST dot operand so the (sub, 4) result lands sublane-major —
    subgroup-gated passes accumulate into (block, k) VMEM scratch with
    cheap static sublane slices (lane-offset updates at sub-128 offsets
    have no cheap Mosaic lowering). own3, when given, must be (sub, 1)
    sublane COLUMNS (not lane rows). Returns ([3 x (sub, 1)], rw)."""
    f = slab[row0:row0 + 3, :]                   # (3, ccol)
    c = slab[row0:row0 + 3, 0:1]                 # (3, 1) tile-local center
    ones = jnp.ones((1, w.shape[1]), jnp.float32)
    fm = jnp.concatenate([f - c, ones], axis=0)  # (4, ccol)
    if round_w and not exact_w:
        w = w.astype(jnp.bfloat16).astype(jnp.float32)
        exact_w = True
    s = _dotT(w, fm, exact_a=exact_w)            # (sub, 4)
    rw = s[:, 3:4]
    out = []
    for k in range(3):
        sk = s[:, k:k + 1]
        ck = c[k:k + 1, 0:1]                     # (1, 1) broadcast scalar
        if own3 is None:
            out.append(sk + ck * rw)
        else:
            out.append((own3[k] - ck) * rw - sk)
    return out, rw


def _wsum3c(w, slab, row0, own3=None, exact_w=False, round_w=False):
    out, _ = _wsum3c_rw(w, slab, row0, own3, exact_w, round_w)
    return out


def _group_of(n_blocks: int) -> int:
    """Blocks per grid step: the largest of 8/4/2/1 dividing n_blocks."""
    for g in (8, 4, 2, 1):
        if n_blocks % g == 0:
            return g
    return 1


def _make_pass(prep_fn, tile_fn, *, own_cols, slab_cols, n_outputs,
               block, ccol, n_blocks, interpret=False, finish_fn=None,
               own_t_rows=None):
    """Build a jitted pair pass over [n_blocks] own blocks.

    prep_fn(orow, ocol) -> own_ctx — once per block; orow(a) reads own
      field a as a natural (1, block) lane row, ocol(a) as a (block, 1)
      sublane column (from one identity-matmul transpose of the whole own
      block on the MXU).
    tile_fn(own_ctx, slab, ctx, accs) -> accs — per ccol-wide slab tile;
      slab is a VMEM ref view [slab_cols, ccol]; ctx carries own_gid
      (block, 1) global sorted row ids (id-matching passes only); accs is
      a tuple of accumulators. There is NO per-pair window mask: tiles
      are disjoint + covering (see module docstring).

    Each grid step processes a GROUP of (up to) 8 consecutive own blocks
    with a single own-block DMA and one output block: the per-grid-step
    fixed overhead (own DMA wait + prologue + output) measured 1.69 ms
    per pass at one block per step — ~46% of the density pass.

    Tile streaming uses a FLAT tile table and a continuous DEPTH-slot
    DMA ring that crosses sub-block and grid-step boundaries: tile t's
    slab columns are flat_t[t] (global tile index t = gts_t[b] + s for
    tile s of block b), its VMEM slot is t % DEPTH, and each tile's
    compute issues the DMA for tile t + DEPTH. The r4 on-chip sweep
    measured ~42% of step time as per-tile fixed cost with the previous
    depth-2 per-block ring (8-16 KB DMAs cannot hide their own issue
    latency behind ~0.4 us of tile compute, and every sub-block paid a
    pipeline refill); the continuous deep ring removes the refills and
    keeps DEPTH-1 DMAs in flight at all times.

    Scalar-prefetch tables arrive in the legacy 6-tuple format from
    core.fast._window_tables — aln/lo/hi/s0 flattened [n_blocks * 3]
    int32 chunk descriptors, cnt [n_blocks], own_base [1] (the column of
    own block 0 inside the pack; 0 single-chip, the halo engine passes
    the device's local slab offset, a multiple of ALIGN) — and `call`
    converts them to (flat, gts, own_base) on the fly (cheap vector ops,
    CSE'd across the step's passes).
    """
    n_prefetch = 3
    group = _group_of(n_blocks)
    cap = n_blocks * _tile_cap(ccol)
    DEPTH = _depth()
    # number of own fields prep_fn reads as (block, 1) COLUMNS (they must
    # be the first rows of the own pack): the per-sub-block MXU transpose
    # costs ~ block^2 x rows MACs x 3 split passes, so transposing only
    # the needed rows (3 of 8 for density/viscsurf/springs) cuts a
    # measured slice of the ~7.6 ms/step fixed-cost floor (r4 ablation)
    t_rows = own_t_rows or own_cols

    def kernel(flat_t, gts_t, ob_t, own_h, slab_h, *rest):
        outs = rest[:n_outputs]
        own_scr, slab_scr, osem, ssem = rest[n_outputs:]

        g = pl.program_id(0)
        base_b = g * group
        own_off0 = pl.multiple_of(ob_t[0] + base_b * block, ALIGN)
        cp_own = pltpu.make_async_copy(
            own_h.at[:, pl.ds(own_off0, group * block)], own_scr, osem
        )
        cp_own.start()
        t_total = gts_t[n_blocks]

        def tile_copy(t):
            off = pl.multiple_of(flat_t[t], ALIGN)
            return pltpu.make_async_copy(
                slab_h.at[:, pl.ds(off, ccol)],
                slab_scr.at[jax.lax.rem(t, DEPTH)],
                ssem.at[jax.lax.rem(t, DEPTH)],
            )

        # prime the ring once with DEPTH-1 tiles; it then stays full
        # across sub-blocks AND grid steps (TPU grid iterations are
        # sequential and scratch + semaphores persist, so DMAs started
        # late in grid step g are waited on in step g+1). The ring runs
        # at depth DEPTH-1 so tile t's refill lands in the slot freed by
        # tile t-1 — never the slot tile t is about to read (no
        # write-after-read hazard on the in-flight slot).
        @pl.when(g == 0)
        def _():
            def prime(i, c):
                @pl.when(i < t_total)
                def _():
                    tile_copy(i).start()
                return c

            jax.lax.fori_loop(0, DEPTH - 1, prime, 0)

        cp_own.wait()
        # one (split, exact) MXU transpose per sub-block: rows
        # (cols, block) -> columns (block, cols); Mosaic has no cheap
        # sublane<->lane relayout
        eye = _eye_of(block)

        for sub in range(group):
            b = base_b + sub
            t0 = gts_t[b]
            n_s = gts_t[b + 1] - t0
            own_off = own_off0 + sub * block
            o0 = sub * block
            # (block, t_rows): out[i, a] = own[a, i]
            ownT = _eye_dot(own_scr[:t_rows, o0:o0 + block], eye,
                            (((1,), (1,)), ((), ())), v_first=False)

            def orow(a, o0=o0):
                return own_scr[a:a + 1, o0:o0 + block]

            def ocol(a, ownT=ownT):
                return ownT[:, a:a + 1]

            own_ctx = prep_fn(orow, ocol)
            own_gid = own_off + jax.lax.broadcasted_iota(
                jnp.int32, (block, 1), 0
            )
            ctx = dict(own_gid=own_gid)

            def body(s, accs, t0=t0, own_ctx=own_ctx, ctx=ctx):
                t = t0 + s
                tile_copy(t).wait()

                # refill the slot tile t-1 freed, then compute tile t
                @pl.when(t + DEPTH - 1 < t_total)
                def _():
                    tile_copy(t + DEPTH - 1).start()

                return tile_fn(
                    own_ctx, slab_scr.at[jax.lax.rem(t, DEPTH)], ctx, accs
                )

            if finish_fn is None:
                accs = tuple(
                    jnp.zeros((1, block), jnp.float32)
                    for _ in range(n_outputs)
                )
                accs = jax.lax.fori_loop(0, n_s, body, accs)
            else:
                # tile_fn accumulates (block, 1) sublane columns (VPU
                # lane reductions); finish_fn turns them into (1, block)
                # lane rows once per sub-block
                accs = tuple(
                    jnp.zeros((block, 1), jnp.float32)
                    for _ in range(n_outputs)
                )
                accs = finish_fn(jax.lax.fori_loop(0, n_s, body, accs))
            row = (base_b + sub) % 8 if group < 8 else sub
            for k in range(n_outputs):
                outs[k][pl.ds(row, 1), :] = accs[k]

    # Packs must stay in HBM: the compiler would otherwise place small
    # inputs in VMEM, where dynamically-offset DMA slices can't be lowered.
    mspace = pl.ANY if interpret else pltpu.HBM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(n_blocks // group,),
        in_specs=[
            pl.BlockSpec(memory_space=mspace),  # own pack [cols, n_alloc]
            pl.BlockSpec(memory_space=mspace),  # slab pack [cols, n_alloc]
        ],
        out_specs=tuple(
            pl.BlockSpec((8, block),
                         lambda g, *_: (g * group // 8, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_outputs)
        ),
        scratch_shapes=(
            [pltpu.VMEM((-(-own_cols // 8) * 8, group * block),
                        jnp.float32),
             pltpu.VMEM((DEPTH, -(-slab_cols // 8) * 8, ccol),
                        jnp.float32)]
            + [pltpu.SemaphoreType.DMA,
               pltpu.SemaphoreType.DMA((DEPTH,))]
        ),
    )
    n_pad = n_blocks * block
    rows8 = -(-n_blocks // 8) * 8
    out_shape = tuple(
        jax.ShapeDtypeStruct((rows8, block), jnp.float32)
        for _ in range(n_outputs)
    )

    def call(tables, own_pack, slab_pack):
        assert len(tables) == 6, (
            f"pass expects the 6-tuple table format, got {len(tables)}"
        )
        args = list(_flat_tile_tables(tables, ccol, n_blocks, cap)) \
            + [own_pack, slab_pack]
        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(*args)
        if n_outputs == 1:
            return res[0][:n_blocks].reshape(n_pad)
        return tuple(r[:n_blocks].reshape(n_pad) for r in res)

    return call


def _make_sub_pass(prep_fn, tile_fn, *, own_cols, slab_cols, n_outputs,
                   block, sub, ccol, n_blocks, interpret=False,
                   finish_fn=None, own_t_rows=None):
    """Subgroup-gated variant of :func:`_make_pass` (round 4).

    The maskless block window is the UNION of its own rows' reach: a
    256-row block spans several pencils, so every row pays pair math for
    ~1,600 candidate columns when its own 32-row neighborhood only
    reaches ~800 (measured, scripts/r3_window_analysis.py). This pass
    splits each block into ``block//sub`` subgroups of ``sub`` consecutive
    sorted rows; per streamed tile, a subgroup computes ONLY when the tile
    overlaps one of the subgroup's three dz-band column windows (scalar
    SMEM test). DMA stays block-level (it is ~2 orders of magnitude below
    the VPU cost); compute drops to the per-subgroup coverage.

    Correctness: the maskless invariant holds PER SUBGROUP — any column
    outside a subgroup's pencil-band windows is >= h from all its rows at
    sort time, so every skipped (tile, subgroup) contribution is exactly
    0.0, and f32 ``x + 0.0 == x`` for the accumulators (which start at
    +0.0). Results are bit-identical to the ungated pass modulo reduction
    association, which is preserved: per-row lane/MXU reduction order over
    each tile is unchanged, and tiles arrive in the same order.

    Contract differences from _make_pass:
    * two extra prefetch tables glo_t/ghi_t, flattened
      [n_blocks * 3 * n_groups] int32 — per (block, dz band, subgroup)
      UNMERGED column windows (core.fast._window_tables emits them);
    * prep_fn's orow/ocol read the SUBGROUP's rows: orow(a) -> (1, sub),
      ocol(a) -> (sub, 1);
    * tile_fn accumulates (sub, 1) sublane columns (use _wsum3c for MXU
      reductions — lane-row accumulators would need sub-128 lane-offset
      updates, which Mosaic has no cheap lowering for);
    * finish_fn maps the final tuple of (block, 1) columns to (1, block)
      lane rows (default: _col_to_row each).
    """
    n_prefetch = 8
    group = _group_of(n_blocks)
    ng = block // sub
    assert block % sub == 0 and sub % 8 == 0, (block, sub)

    def kernel(aln_t, lo_t, hi_t, s0_t, cnt_t, ob_t, glo_t, ghi_t,
               own_h, slab_h, *rest):
        del lo_t, hi_t  # maskless: tiles are disjoint + covering
        outs = rest[:n_outputs]
        own_scr, slab_scr, acc_scr, osem, ssem = rest[n_outputs:]

        g = pl.program_id(0)
        base_b = g * group
        own_off0 = pl.multiple_of(ob_t[0] + base_b * block, ALIGN)
        cp_own = pltpu.make_async_copy(
            own_h.at[:, pl.ds(own_off0, group * block)], own_scr, osem
        )
        cp_own.start()

        def tile_chunk_off(b3, s):
            c = b3 + ((s >= s0_t[b3 + 1]).astype(jnp.int32)
                      + (s >= s0_t[b3 + 2]).astype(jnp.int32))
            off = aln_t[c] + (s - s0_t[c]) * ccol
            return c, pl.multiple_of(off, ALIGN)

        def tile_copy(b3, s, slot):
            _, off = tile_chunk_off(b3, s)
            return pltpu.make_async_copy(
                slab_h.at[:, pl.ds(off, ccol)], slab_scr.at[slot],
                ssem.at[slot],
            )

        cp_own.wait()
        eye = _eye_of(block)

        for sub_b in range(group):
            b = base_b + sub_b
            b3 = b * 3
            n_s = cnt_t[b]
            own_off = own_off0 + sub_b * block
            o0 = sub_b * block
            ownT = _eye_dot(own_scr[:, o0:o0 + block], eye,
                            (((1,), (1,)), ((), ())), v_first=False)

            # per-subgroup own contexts (tile-independent; hoisted out of
            # the tile loop — slicing only)
            sub_ctxs = []
            for gg in range(ng):
                r0 = gg * sub

                def orow(a, o0=o0, r0=r0):
                    return own_scr[a:a + 1, o0 + r0:o0 + r0 + sub]

                def ocol(a, ownT=ownT, r0=r0):
                    return ownT[r0:r0 + sub, a:a + 1]

                gid = own_off + r0 + jax.lax.broadcasted_iota(
                    jnp.int32, (sub, 1), 0
                )
                sub_ctxs.append((prep_fn(orow, ocol), dict(own_gid=gid)))

            acc_scr[...] = jnp.zeros((block, n_outputs), jnp.float32)

            @pl.when(n_s > 0)
            def _(b3=b3):
                tile_copy(b3, 0, 0).start()

            def body(s, carry, b3=b3, n_s=n_s, sub_ctxs=sub_ctxs):
                slot = jax.lax.rem(s, 2)

                @pl.when(s + 1 < n_s)
                def _():
                    tile_copy(b3, s + 1, jax.lax.rem(s + 1, 2)).start()

                _, off = tile_chunk_off(b3, s)
                tile_copy(b3, s, slot).wait()
                slab = slab_scr.at[slot]
                for gg in range(ng):
                    # the tile computes for subgroup gg iff it overlaps
                    # ANY of gg's three dz-band windows (unmerged — robust
                    # to the block chunks' dedup merging)
                    active = None
                    for dzc in range(3):
                        i = (b3 + dzc) * ng + gg
                        hit = (ghi_t[i] > off) & (glo_t[i] < off + ccol)
                        active = hit if active is None else (active | hit)
                    own_ctx, ctx = sub_ctxs[gg]
                    r0 = gg * sub

                    @pl.when(active)
                    def _(own_ctx=own_ctx, ctx=ctx, r0=r0, slab=slab):
                        accs = tuple(
                            acc_scr[r0:r0 + sub, k:k + 1]
                            for k in range(n_outputs)
                        )
                        new = tile_fn(own_ctx, slab, ctx, accs)
                        for k in range(n_outputs):
                            acc_scr[r0:r0 + sub, k:k + 1] = new[k]
                return carry

            jax.lax.fori_loop(0, n_s, body, 0)
            cols = tuple(
                acc_scr[:, k:k + 1] for k in range(n_outputs)
            )
            rows = (finish_fn(cols) if finish_fn is not None
                    else tuple(_col_to_row(a) for a in cols))
            row = (base_b + sub_b) % 8 if group < 8 else sub_b
            for k in range(n_outputs):
                outs[k][pl.ds(row, 1), :] = rows[k]

    mspace = pl.ANY if interpret else pltpu.HBM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(n_blocks // group,),
        in_specs=[
            pl.BlockSpec(memory_space=mspace),
            pl.BlockSpec(memory_space=mspace),
        ],
        out_specs=tuple(
            pl.BlockSpec((8, block),
                         lambda g, *_: (g * group // 8, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_outputs)
        ),
        scratch_shapes=(
            [pltpu.VMEM((-(-own_cols // 8) * 8, group * block),
                        jnp.float32),
             pltpu.VMEM((2, -(-slab_cols // 8) * 8, ccol), jnp.float32),
             pltpu.VMEM((block, n_outputs), jnp.float32)]
            + [pltpu.SemaphoreType.DMA,
               pltpu.SemaphoreType.DMA((2,))]
        ),
    )
    n_pad = n_blocks * block
    rows8 = -(-n_blocks // 8) * 8
    out_shape = tuple(
        jax.ShapeDtypeStruct((rows8, block), jnp.float32)
        for _ in range(n_outputs)
    )

    def call(tables, own_pack, slab_pack):
        assert len(tables) == n_prefetch, (
            f"sub pass expects {n_prefetch} tables, got {len(tables)}"
        )
        args = list(tables) + [own_pack, slab_pack]
        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(*args)
        if n_outputs == 1:
            return res[0][:n_blocks].reshape(n_pad)
        return tuple(r[:n_blocks].reshape(n_pad) for r in res)

    return call


def _q2_of(oc, slab, inv_h2, row0=0, own_start=0):
    """Exact pair q^2 (block, ccol) from the own (block, 1) columns
    oc[own_start..+3) and slab rows [row0, +3)."""
    dx = oc[own_start] - _srow(slab, row0)
    dy = oc[own_start + 1] - _srow(slab, row0 + 1)
    dz = oc[own_start + 2] - _srow(slab, row0 + 2)
    q2 = (dx * dx + dy * dy + dz * dz) * inv_h2
    return q2, dx, dy, dz


def _r2_of(oc, slab):
    """Unscaled pair r^2 (block, ccol) — the density/rho* tiles fold the
    1/h^2 scale into their output constants, one mul/pair cheaper."""
    dx = oc[0] - _srow(slab, 0)
    dy = oc[1] - _srow(slab, 1)
    dz = oc[2] - _srow(slab, 2)
    return dx * dx + dy * dy + dz * dz


def _split3(v):
    """3-way bf16 split: v == hi + mid + lo to ~6e-8 relative, each part
    exactly bf16-representable."""
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    r = v - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (r - mid).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, mid, lo


def _eye_dot(v, eye, dims, v_first=True):
    """Identity contraction (transpose) at full precision in 3 DEFAULT
    MXU passes: eye's {0,1} entries are exactly bf16, so splitting only
    the data operand makes every product exact — half the issue count of
    precision=HIGHEST (the per-sub-block transposes were ~10 ms/step at
    HIGHEST across the 9 passes)."""
    out = None
    for part in _split3(v):
        a, b = (part, eye) if v_first else (eye, part)
        d = jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        out = d if out is None else out + d
    return out


def _eye_of(block):
    return (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
            ).astype(jnp.float32)


def _col_to_row(acc):
    """(block, 1) sublane column -> (1, block) lane row via identity
    contraction (Mosaic has no cheap sublane<->lane relayout)."""
    return _eye_dot(acc, _eye_of(acc.shape[0]), (((0,), (0,)), ((), ())))


def _maker(block, sub):
    """_make_pass, or _make_sub_pass when a proper subgroup size is set."""
    if sub and sub < block:
        def make(prep_fn, tile_fn, **kw):
            return _make_sub_pass(prep_fn, tile_fn, sub=sub, **kw)

        return make
    return _make_pass


def make_density_pass(*, block, ccol, n_blocks, inv_h2, c_rho,
                      interpret=False, sub=None, **_):
    """rho_i = c_rho * max(1, sum_{j != i} poly6 over pairs q^2 <= 1)
    (sphFluid.cl:472-518, all-pairs form).

    Maskless: the tile accumulates t^3 with t = max(h^2 - r^2, 0) — zero
    for every column beyond the window, and the 1/h^2 scale is folded into
    the output constants (one mul/pair cheaper than (1-q^2)^3); the exact
    self term (r = 0 -> t^3 = (h^2)^3 in f32 rounding) is subtracted after
    the reduction. The single scalar-per-own reduction runs on the VPU
    (lane sum into a (block, 1) accumulator) — exact f32, and cheaper than
    the 6-pass HIGHEST MXU dot a one-quantity reduction would need."""
    h2 = np.float32(1.0) / np.float32(inv_h2)
    self3 = np.float32(h2 * h2) * h2             # f32-rounded (h^2)^3
    inv_h6 = np.float32(inv_h2) * np.float32(inv_h2) * np.float32(inv_h2)

    def prep(orow, ocol):
        return dict(oc=[ocol(k) for k in range(3)])

    def tile(own, slab, ctx, accs):
        t = jnp.maximum(h2 - _r2_of(own["oc"], slab), 0.0)
        (acc,) = accs
        return (acc + jnp.sum(t * t * t, axis=1, keepdims=True),)

    def finish(accs):
        return (_col_to_row(accs[0]),)

    raw = _maker(block, sub)(prep, tile, own_cols=MAIN_COLS,
                             slab_cols=MAIN_COLS, n_outputs=1, block=block,
                             ccol=ccol, n_blocks=n_blocks,
                             interpret=interpret, finish_fn=finish,
                             own_t_rows=3)

    def call(tables, own_pack, slab_pack):
        # subtract the exact self term (included maskless); rows with a
        # zeroed tile count (gated far walls, phantoms) sum 0 and clamp
        # to c_rho exactly as before
        s = raw(tables, own_pack, slab_pack)
        return c_rho * jnp.maximum((s - self3) * inv_h6, 1.0)

    return call


def make_viscsurf_pass(*, block, ccol, n_blocks, inv_h2, interpret=False,
                       sub=None, **_):
    """Fused viscosity + surface-tension pair sums (sphFluid.cl:589-708),
    over q < 1 pairs: visc = sum (ve_j - ve_i)(1-q)/rho_j, surf = sum
    (x_i - x_j). Boundary neighbors contribute wall normals as velocity
    (pack's VE columns pre-substituted). Outputs (vx, vy, vz, sx, sy, sz).

    The PM_RHO slab row carries 1/rho (pre-inverted by the caller): a
    per-pair divide costs several VPU passes, a per-particle reciprocal
    in the glue is one vectorized op over N.

    Maskless: wv = max(1-q, 0)/rho_j vanishes beyond the window; the self
    terms cancel analytically (visc: wv_ii * ve_i appears in both the
    field sum and ve_i * row-sum; surf: x_i - x_i = 0)."""

    def prep(orow, ocol):
        return dict(oc=[ocol(k) for k in range(3)],
                    vo=[orow(PM_VEX + k) for k in range(3)],
                    xo=[orow(k) for k in range(3)])

    h = np.float32(1.0) / np.float32(np.sqrt(inv_h2))
    h2 = np.float32(1.0) / np.float32(inv_h2)

    def tile(own, slab, ctx, accs):
        # r-domain: t = max(h - r, 0) = h * max(1 - q, 0); the extra h
        # factor is divided back out of the reduced outputs in call()
        r2 = _r2_of(own["oc"], slab)
        t = jnp.maximum(h - jnp.sqrt(r2), 0.0)
        wv = t * _srow(slab, PM_RHO)             # PM_RHO carries 1/rho
        ws = (r2 < h2).astype(jnp.float32)

        sv, rv = _wsum3_rw(wv, slab, PM_VEX)     # sum wv * ve_j (+ row-sum)
        # ws is {0,1} — exactly bf16, no split needed
        sx = _wsum3(ws, slab, PM_X, own3=own["xo"], exact_w=True)

        vx, vy, vz, stx, sty, stz = accs
        vo = own["vo"]
        vx = vx + sv[0] - vo[0] * rv
        vy = vy + sv[1] - vo[1] * rv
        vz = vz + sv[2] - vo[2] * rv
        return vx, vy, vz, stx + sx[0], sty + sx[1], stz + sx[2]

    if sub and sub < block:
        # subgroup mode: everything own-side is a (sub, 1) sublane column
        # and the reductions are column-major (_wsum3c) — same math
        def prep_c(orow, ocol):
            return dict(oc=[ocol(k) for k in range(3)],
                        vo=[ocol(PM_VEX + k) for k in range(3)])

        def tile_c(own, slab, ctx, accs):
            r2 = _r2_of(own["oc"], slab)
            t = jnp.maximum(h - jnp.sqrt(r2), 0.0)
            wv = t * _srow(slab, PM_RHO)
            ws = (r2 < h2).astype(jnp.float32)
            sv, rv = _wsum3c_rw(wv, slab, PM_VEX)
            sx = _wsum3c(ws, slab, PM_X, own3=own["oc"], exact_w=True)
            vx, vy, vz, stx, sty, stz = accs
            vo = own["vo"]
            vx = vx + sv[0] - vo[0] * rv
            vy = vy + sv[1] - vo[1] * rv
            vz = vz + sv[2] - vo[2] * rv
            return vx, vy, vz, stx + sx[0], sty + sx[1], stz + sx[2]

        prep, tile = prep_c, tile_c

    raw = _maker(block, sub)(prep, tile, own_cols=MAIN_COLS,
                             slab_cols=MAIN_COLS, n_outputs=6, block=block,
                             own_t_rows=3,
                             ccol=ccol, n_blocks=n_blocks,
                             interpret=interpret)
    inv_h = np.float32(np.sqrt(inv_h2))

    def call(tables, own_pack, slab_pack):
        vx, vy, vz, stx, sty, stz = raw(tables, own_pack, slab_pack)
        return vx * inv_h, vy * inv_h, vz * inv_h, stx, sty, stz

    return call


def make_rho_star_pass(*, block, ccol, n_blocks, inv_h2, c_rho,
                       interpret=False, sub=None, raw=False, **_):
    """Predicted density (sphFluid.cl:982-1059): contribution from
    predicted positions with q*^2 < 1 strict; maskless like the density
    pass (t = max(h^2 - r*^2, 0), folded 1/h^2 scale, exact self term
    subtracted after).

    Documented deviation: the reference restricts the pair set to the
    time-t neighborMap (cached-neighbor semantics) in addition to the
    predicted-distance cutoff; prediction displacement per iteration is
    ~1e-3 h, so the symmetric difference lies in the q* ~ 1 shell where
    (1-q*^2)^3 ~ 1e-9 — below f32 round-off of the sum. Dropping the
    time-t test saves a second q^2 evaluation per pair (~30% of the
    pass's VPU work). Pack cols: 0-2 predicted pos.

    ``raw=True`` returns the bare t^3 pair sums (NO self-term subtraction
    or c_rho clamp): the wall-compact engine (core/fastw.py) splits each
    density into several column-set passes (moving/shell/wall) and must
    combine the raw sums before the single clamp."""
    h2 = np.float32(1.0) / np.float32(inv_h2)
    self3 = np.float32(h2 * h2) * h2
    inv_h6 = np.float32(inv_h2) * np.float32(inv_h2) * np.float32(inv_h2)

    def prep(orow, ocol):
        return dict(oc=[ocol(k) for k in range(3)])

    def tile(own, slab, ctx, accs):
        t = jnp.maximum(h2 - _r2_of(own["oc"], slab), 0.0)
        (acc,) = accs
        return (acc + jnp.sum(t * t * t, axis=1, keepdims=True),)

    def finish(accs):
        return (_col_to_row(accs[0]),)

    raw_call = _maker(block, sub)(prep, tile, own_cols=ITER_COLS,
                                  slab_cols=ITER_COLS, n_outputs=1,
                                  block=block, ccol=ccol, n_blocks=n_blocks,
                                  interpret=interpret, finish_fn=finish)
    if raw:
        return raw_call

    def call(tables, own_pack, slab_pack):
        s = raw_call(tables, own_pack, slab_pack)
        return c_rho * jnp.maximum((s - self3) * inv_h6, 1.0)

    return call


def make_paccel_pass(*, block, ccol, n_blocks, inv_h2, inv_h, rho0_delta,
                     interpret=False, sub=None, **_):
    """Pressure-force pair sums (sphFluid.cl:1101-1212): for 0 < q < 1
    pairs, term = (1-q)^2 * 0.5 * (p_i + p_j)/rho*_j, anti-clump
    substitution below q = 0.25; direction = unit(x_i - x_j), scaled by
    inv_h to match the reference's spiky gradient (applied once to the
    reduced (1, block) outputs, not per pair).
    Pack cols: [x, y, z, 1/rho*, p] (time-t positions; rho* pre-inverted
    by the caller — a per-pair divide costs several VPU passes).
    Maskless: the q^2 > 0 factor excludes self (and coincident pairs,
    matching the reference's zero-distance guard); beyond the window the
    far branch max(1-q, 0)^2 vanishes and q >= 1 > 0.25 never selects the
    close branch, so no q < 1 test is needed."""

    def prep(orow, ocol):
        return dict(oc=[ocol(k) for k in range(3)], po=ocol(4),
                    xo=[orow(k) for k in range(3)])

    h = np.float32(1.0) / np.float32(inv_h)
    h4 = np.float32(h / 4.0)
    rho0_delta_f = np.float32(rho0_delta)

    def tile(own, slab, ctx, accs):
        # r-domain: every q-term is computed as h*(that term) so the
        # inv_h2 pair-scale and the common 0.5 factor fold into the
        # output constant in call() — two fewer VPU ops per pair
        r2 = _r2_of(own["oc"], slab)
        # one rsqrt yields both r (= r2 * rsqrt(r2)) and 1/r — the sqrt +
        # divide pair it replaces was ~30% of this tile's VPU work
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        r = r2 * inv_r
        t = jnp.maximum(h - r, 0.0)              # h * (1 - q)
        inv_srho = _srow(slab, 3)                # pre-inverted rho*
        sp = _srow(slab, 4)
        far = t * t * (own["po"] + sp)
        cm = h4 - r                              # h * (0.25 - q)
        close = cm * cm * rho0_delta_f
        term = jnp.where(cm > 0.0, close, far) * inv_srho
        w = jnp.where(r2 > 0.0, term * inv_r, 0.0)

        s = _wsum3(w, slab, 0, own3=own["xo"])   # sum w * (x_i - x_j)
        ax, ay, az = accs
        return ax + s[0], ay + s[1], az + s[2]

    if sub and sub < block:
        def prep_c(orow, ocol):
            return dict(oc=[ocol(k) for k in range(3)], po=ocol(4))

        def tile_c(own, slab, ctx, accs):
            r2 = _r2_of(own["oc"], slab)
            inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
            r = r2 * inv_r
            t = jnp.maximum(h - r, 0.0)
            inv_srho = _srow(slab, 3)
            sp = _srow(slab, 4)
            far = t * t * (own["po"] + sp)
            cm = h4 - r
            close = cm * cm * rho0_delta_f
            term = jnp.where(cm > 0.0, close, far) * inv_srho
            w = jnp.where(r2 > 0.0, term * inv_r, 0.0)
            s = _wsum3c(w, slab, 0, own3=own["oc"])
            ax, ay, az = accs
            return ax + s[0], ay + s[1], az + s[2]

        prep, tile = prep_c, tile_c

    raw = _maker(block, sub)(prep, tile, own_cols=PACC_COLS,
                             slab_cols=PACC_COLS, n_outputs=3, block=block,
                             ccol=ccol, n_blocks=n_blocks,
                             interpret=interpret)
    # in-kernel w = 2h * (reference w): the r-domain terms carry h^2 and
    # drop the common 0.5; with the reference's final inv_h gradient
    # scale the reduced outputs need x inv_h/(2h) = 0.5 * inv_h^2
    out_c = np.float32(0.5) * np.float32(inv_h) * np.float32(inv_h)

    def call(tables, own_pack, slab_pack):
        fx, fy, fz = raw(tables, own_pack, slab_pack)
        return fx * out_c, fy * out_c, fz * out_c

    return call


# spring pack rows: 0-2 elastic positions, then n_slots neighbor sorted
# ids (f32, -1 pad), n_slots rest lengths (m), n_slots activation force
# terms — n_slots is the scene's measured max spring degree (the
# reference's fixed 32-slot table is mostly padding: the worm's max
# degree is 16, mean 13.6), which halves the match loop below.
SPR_IDX0 = 3


def spr_cols(n_slots: int) -> int:
    return 3 + 3 * n_slots


def make_spring_pass(*, block, ccol, n_blocks, inv_h, h_scale, k_spring,
                     n_slots=32, interpret=False, **_):
    """Elastic + muscle spring forces as a pair pass over the COMPACT
    elastic slab (sphFluid.cl:709-815), replacing the [Ne,32] XLA
    position gathers (measured ~7.5 ms/step on the worm).

    The slab lists each elastic particle j's spring partners as sorted row
    ids; a pair (own i, slab j) matches when i appears in j's list (the
    graph is symmetric). Matching uses NO radius cutoff, and maskless
    tiles mean a spring is included whenever its partner column lands in
    the block's tile coverage — i.e. window-margin drop-out is now even
    rarer than in r2 (coverage is a superset of the window).

    Own pack = the main pack (positions at rows 0-2). Outputs (ax, ay, az)
    in scaled-SI acceleration units.
    """

    def prep(orow, ocol):
        return dict(oc=[ocol(k) for k in range(3)],
                    xo=[orow(k) for k in range(3)])

    def tile(own, slab, ctx, accs):
        # dx etc. in sim units; q2 = dist^2 / h^2
        dx = own["oc"][0] - _srow(slab, 0)
        dy = own["oc"][1] - _srow(slab, 1)
        dz = own["oc"][2] - _srow(slab, 2)
        q2 = (dx * dx + dy * dy + dz * dz) * (inv_h * inv_h)
        own_gid_f = ctx["own_gid"].astype(jnp.float32)

        msum = jnp.zeros_like(q2)
        rest_acc = jnp.zeros_like(q2)
        actf_acc = jnp.zeros_like(q2)
        for s in range(n_slots):
            m = (_srow(slab, SPR_IDX0 + s) == own_gid_f).astype(jnp.float32)
            msum = msum + m
            rest_acc = rest_acc + m * _srow(slab, SPR_IDX0 + n_slots + s)
            actf_acc = actf_acc + m * _srow(slab, SPR_IDX0 + 2 * n_slots + s)

        inv_q = jax.lax.rsqrt(jnp.maximum(q2, 1e-30))
        r_m = q2 * inv_q * h_scale                  # r in meters
        coef = -(r_m * msum - rest_acc) * k_spring - actf_acc
        ok = (msum > 0.0) & (q2 > 0.0)
        # accel = (x_i - x_j)_m / r_m * coef; on sim-unit dx that is
        # dx * coef * rsqrt(q2) / h
        w = jnp.where(ok, coef * inv_q * inv_h, 0.0)
        s3 = _wsum3(w, slab, 0, own3=own["xo"])
        ax, ay, az = accs
        return ax + s3[0], ay + s3[1], az + s3[2]

    return _make_pass(prep, tile, own_t_rows=3, own_cols=MAIN_COLS,
                      slab_cols=spr_cols(n_slots),
                      n_outputs=3, block=block, ccol=ccol,
                      n_blocks=n_blocks, interpret=interpret)


def make_boundary_pass(*, block, ccol, n_blocks, inv_h2, r0,
                       interpret=False, **_):
    """Ihmsen boundary-response pair sums (sphFluid.cl:824-887).

    own pack cols: [x_t, y_t, z_t, xn, yn, zn]; slab = boundary pack.
    Pair set: within h at time t AND slab is boundary; weights from the
    distance of the *new* own position to the boundary particle.
    Maskless: out-of-window columns are >= h away, where both the time-t
    cutoff and the max(0, (r0-d)/r0) weight (reach r0 = h/2) vanish.
    Outputs: n_ci (3), w_sum, w2_sum."""

    def prep(orow, ocol):
        return dict(oc=[ocol(k) for k in range(6)])

    inv_r0 = np.float32(1.0 / r0)

    def tile(own, slab, ctx, accs):
        oc = own["oc"]
        isb = _srow(slab, PB_ISB)
        # no self-exclusion: own boundary rows that would self-pair have
        # their outputs pinned by the caller anyway. The reference's
        # additional time-t h-cutoff is dropped: the weight reaches only
        # r0 = h/2 on post-step distances, so a pair it would exclude
        # must close from > h to < h/2 in ONE step — CFL-violating.
        # Multiplying by the {0,1} isb flag masks pad columns (which are
        # also far) and, on the halo engine's full slab, moving columns.
        dnx = oc[3] - _srow(slab, PB_X)
        dny = oc[4] - _srow(slab, PB_Y)
        dnz = oc[5] - _srow(slab, PB_Z)
        dist = jnp.sqrt(dnx * dnx + dny * dny + dnz * dnz)
        w = jnp.maximum(0.0, (r0 - dist) * inv_r0) * isb
        wd = w * (r0 - dist)

        sn, rw = _wsum3_rw(w, slab, PB_NX)       # sum w * n_j (+ row-sum)
        ax, ay, az, ws, w2 = accs
        return (ax + sn[0], ay + sn[1], az + sn[2],
                ws + rw, w2 + _lsum(wd))

    return _make_pass(prep, tile, own_cols=OWN_COLS,
                      slab_cols=BND_COLS, n_outputs=5, block=block,
                      ccol=ccol, n_blocks=n_blocks, interpret=interpret)


def make_membrane_pass(*, block, ccol, n_blocks, inv_h2, r0,
                       interpret=False, **_):
    """Membrane interaction pair sums (sphFluid.cl:1369-1650).

    own pack cols: [x_t, y_t, z_t, xn, yn, zn]; slab = membrane pack: per
    particle 7 x (plane normal, ref point) at rows 6t..6t+5 (zeros when
    absent), rows 42-44 x(t+1), rows 45-47 x(t). Blocks without
    liquid-near-membrane work have their tile count zeroed by the caller.
    Maskless: out-of-window columns are >= h away, where both the time-t
    cutoff and the r0-reach weight vanish; non-membrane columns carry
    all-zero triangle normals (cnt = 0 excludes them); own rows receiving
    the correction are liquid-masked by the caller.
    Outputs: n_ci (3), w_sum, w2_sum.

    Reduction layout: the signed triangle normals are combined into ONE
    per-pair vector v = sum_t sgn_t * n_t on the VPU (3 madds per
    triangle), and the five outputs are exact f32 VPU lane sums into
    (block, 1) accumulators — the previous form issued 7 MXU reduction
    dots per tile (one per triangle slot) plus two row-sum dots, and
    measured dot-issue-bound (~6 ms/step on the worm for ~10k elastic)."""

    def prep(orow, ocol):
        return dict(oc=[ocol(k) for k in range(6)])

    def tile(own, slab, ctx, accs):
        oc = own["oc"]
        # (the reference's additional time-t h-cutoff is dropped, same
        # CFL argument as the boundary pass: the weight reaches only
        # r0 = h/2 on post-step distances)
        xno, yno, zno = oc[3], oc[4], oc[5]
        # per-triangle side signs: s = nt . (xn_own - at); nt == 0 rows
        # (absent triangles) give |nt|^2 == 0 and are skipped via has_t
        shape = (xno.shape[0], slab.shape[1])
        cnt = jnp.zeros(shape, jnp.float32)
        vx = jnp.zeros(shape, jnp.float32)
        vy = jnp.zeros(shape, jnp.float32)
        vz = jnp.zeros(shape, jnp.float32)
        for t in range(7):
            ntx = _srow(slab, 6 * t + 0)
            nty = _srow(slab, 6 * t + 1)
            ntz = _srow(slab, 6 * t + 2)
            atx = _srow(slab, 6 * t + 3)
            aty = _srow(slab, 6 * t + 4)
            atz = _srow(slab, 6 * t + 5)
            s = ((xno - atx) * ntx + (yno - aty) * nty
                 + (zno - atz) * ntz)
            has_t = (ntx * ntx + nty * nty + ntz * ntz > 0.0) & (s != 0.0)
            sgn = jnp.where(has_t, jnp.sign(s), 0.0)
            cnt = cnt + jnp.abs(sgn)
            vx = vx + sgn * ntx
            vy = vy + sgn * nty
            vz = vz + sgn * ntz

        inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
        is_entry = cnt > 0.0

        dnx = xno - _srow(slab, PMM_XN)
        dny = yno - _srow(slab, PMM_YN)
        dnz = zno - _srow(slab, PMM_ZN)
        dist = jnp.sqrt(dnx * dnx + dny * dny + dnz * dnz)
        w = jnp.where(is_entry, jnp.maximum(0.0, (r0 - dist) / r0), 0.0)
        wc = w * inv_cnt

        def ls(m):
            return jnp.sum(m, axis=1, keepdims=True)

        ax, ay, az, ws, w2 = accs
        return (ax + ls(wc * vx), ay + ls(wc * vy), az + ls(wc * vz),
                ws + ls(w), w2 + ls(w * (r0 - dist)))

    def finish(accs):
        return tuple(_col_to_row(a) for a in accs)

    return _make_pass(prep, tile, own_cols=OWN_COLS,
                      slab_cols=MEM_COLS, n_outputs=5, block=block,
                      ccol=ccol, n_blocks=n_blocks, interpret=interpret,
                      finish_fn=finish)
