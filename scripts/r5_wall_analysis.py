"""Round-5 static-wall lever sizing (VERDICT r4 #1): computed pair slots
per step, current engine vs the moving-compact redesign, on the real worm.

STATUS: live instrument (r5). Pure NumPy window accounting (the same
tile/alignment quantization the VPU pays, reusing the r3/r4 conventions);
produces the before/after table that sizes the redesign BEFORE kernel
work, plus the shell-wall population at several drift margins.

The lever: 102k of 232k worm particles are frozen walls
(`/root/reference/src/owHelper.cpp:775-928` generates them once,
`sphFluid.cl:616-622` freezes them), yet today they ride the hot carry
and are streamed as candidate columns of every pair pass. The redesign
keeps only MOVING rows (liquid+elastic) in the carry; wall-wall sums
become exact f64 per-site constants; liquid streams a compact moving
slab plus a thin live SHELL slab (walls within reach+drift of moving
rows — their rho/rho*/p stay dynamic, so semantics are preserved
exactly); deep walls vanish from the step.

Run: python scripts/r5_wall_analysis.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ALIGN = 128


def build_scene():
    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene
    from sph_tpu.constants import BOUNDARY_PARTICLE

    params = SimParams()
    t0 = time.time()
    scene = generate_worm_scene(params)
    print(f"scene: {scene.n_particles} particles {scene.counts}, "
          f"build {time.time()-t0:.1f}s", flush=True)
    pos = np.asarray(scene.pos)
    is_wall = np.asarray(scene.ptype) == BOUNDARY_PARTICLE
    return params, pos, is_wall


def sort_keys(pos, params, cell):
    lo = np.asarray(params.box_min)
    nx = int((params.x_max - params.x_min) / cell) + 1
    ny = int((params.y_max - params.y_min) / cell) + 1
    nz = int((params.z_max - params.z_min) / cell) + 1
    c = np.clip(((pos - lo) / cell).astype(np.int64), 0,
                [nx - 1, ny - 1, nz - 1])
    pencil = c[:, 0] + nx * c[:, 2]
    cid = c[:, 1] + ny * pencil
    order = np.argsort(cid, kind="stable")
    return order, pencil[order], (nx, ny, nz)


def block_tiles(pencil_s, npen, nx, pstart, B, ccol, sub_rows=None):
    """Per-block tile counts with the engine's exact dedup/alignment.

    pstart: cumulative start offsets (len npen+1) in the COLUMN space the
    windows are expressed in (may differ from the row space when columns
    are a compact subset — pass the subset's pstart). Returns
    (tiles [nb], nb). sub_rows: optional per-row mask; a block's pencil
    range still comes from all its rows."""
    n = len(pencil_s)
    nb = -(-n // B)
    pen_pad = np.concatenate([pencil_s, np.full(nb * B - n, pencil_s[-1])])
    first = pen_pad[np.arange(nb) * B]
    last = pen_pad[np.arange(nb) * B + B - 1]
    tiles = np.zeros(nb, np.int64)
    prev_hi = np.zeros(nb, np.int64)
    prev_tend = np.zeros(nb, np.int64)
    for dz in (-1, 0, 1):
        lo_p = np.clip(first + dz * nx - 1, 0, npen)
        hi_p = np.clip(last + dz * nx + 2, 0, npen)
        lo_p = np.maximum(lo_p, prev_hi)
        hi_p = np.maximum(hi_p, lo_p)
        prev_hi = hi_p
        off = pstart[lo_p]
        end = pstart[hi_p]
        aligned = np.maximum((off // ALIGN) * ALIGN, prev_tend)
        ntile = np.where(end > aligned, -((aligned - end) // ccol), 0)
        prev_tend = aligned + ntile * ccol
        tiles += ntile
    return tiles, nb


def subset_tiles(pencil_s, npen, nx, rows_subset_sorted, B, ccol):
    """Tiles per own block when COLUMNS are a compact sorted subset:
    full-space window [lo, hi) -> searchsorted into the subset rows ->
    tile chunks at ccol (the engine's bnd/elastic-compact mechanism)."""
    n = len(pencil_s)
    nb = -(-n // B)
    pen_pad = np.concatenate([pencil_s, np.full(nb * B - n, pencil_s[-1])])
    first = pen_pad[np.arange(nb) * B]
    last = pen_pad[np.arange(nb) * B + B - 1]
    # full-space pstart
    pstart = np.searchsorted(pencil_s, np.arange(npen + 1))
    tiles = np.zeros(nb, np.int64)
    prev_hi = np.zeros(nb, np.int64)
    prev_tend = np.zeros(nb, np.int64)
    for dz in (-1, 0, 1):
        lo_p = np.clip(first + dz * nx - 1, 0, npen)
        hi_p = np.clip(last + dz * nx + 2, 0, npen)
        lo_p = np.maximum(lo_p, prev_hi)
        hi_p = np.maximum(hi_p, lo_p)
        prev_hi = hi_p
        lo_c = np.searchsorted(rows_subset_sorted, pstart[lo_p])
        hi_c = np.searchsorted(rows_subset_sorted, pstart[hi_p])
        aligned = np.maximum((lo_c // ALIGN) * ALIGN, prev_tend)
        ntile = np.where(hi_c > aligned, -((aligned - hi_c) // ccol), 0)
        prev_tend = aligned + ntile * ccol
        tiles += ntile
    return tiles, nb


def main():
    params, pos, is_wall = build_scene()
    h = params.h
    n = len(pos)
    moving = ~is_wall

    # shell sizing: walls within reach h + drift margin of ANY moving row
    from scipy.spatial import cKDTree

    tree = cKDTree(pos[moving])
    dist, _ = tree.query(pos[is_wall], k=1)
    for m in (0.0, 0.25, 0.5, 1.0):
        print(f"shell(h + {m:4.2f}h): "
              f"{int((dist <= h * (1 + m)).sum()):7d} of "
              f"{int(is_wall.sum())} walls", flush=True)
    shell_mask_w = dist <= h * 1.5  # generous default margin for sizing
    print(f"shell(h + 0.50h) chosen for the table: "
          f"{int(shell_mask_w.sum())} shell walls; "
          f"deep walls removed: {int((~shell_mask_w).sum())}", flush=True)

    B = 256
    order, pencil_s, (nx, ny, nz) = sort_keys(pos, params, h)
    npen = nx * nz
    pstart_full = np.searchsorted(pencil_s, np.arange(npen + 1))
    wall_s = is_wall[order]
    mov_s = ~wall_s
    # map the shell mask (indexed over walls in ORIGINAL order) to sorted
    shell_orig = np.zeros(n, bool)
    shell_orig[np.flatnonzero(is_wall)[shell_mask_w]] = True
    shell_s = shell_orig[order]

    # per-block gates (current engine)
    def blockify(mask):
        pad = np.concatenate([mask, np.zeros(-(-n // B) * B - n, bool)])
        return pad.reshape(-1, B)

    own_nonb = blockify(mov_s).any(axis=1)
    # win_has_mv: any moving row in the block's pencil-band window
    seg_mv = np.bincount(pencil_s[mov_s], minlength=npen)
    csum_mv = np.concatenate([[0], np.cumsum(seg_mv)])

    def win_has(first, last, csum):
        has = np.zeros(len(first), bool)
        for dz in (-1, 0, 1):
            lo_p = np.clip(first + dz * nx - 1, 0, npen)
            hi_p = np.clip(last + dz * nx + 2, 0, npen)
            has |= (csum[hi_p] - csum[lo_p]) > 0
        return has

    nb = -(-n // B)
    pen_pad = np.concatenate([pencil_s, np.full(nb * B - n, pencil_s[-1])])
    first_b = pen_pad[np.arange(nb) * B]
    last_b = pen_pad[np.arange(nb) * B + B - 1]
    win_mv = win_has(first_b, last_b, csum_mv)
    seg_b = np.bincount(pencil_s[wall_s], minlength=npen)
    csum_b = np.concatenate([[0], np.cumsum(seg_b)])
    win_b = win_has(first_b, last_b, csum_b)

    # ---------------- current engine (ccol=512 main / 256 compact) -----
    ccol, ccol_c = 512, 256
    t_main, _ = block_tiles(pencil_s, npen, nx, pstart_full, B, ccol)
    rows_w_sorted = np.flatnonzero(wall_s)
    t_bnd, _ = subset_tiles(pencil_s, npen, nx, rows_w_sorted, B, ccol_c)

    def pairs(tiles, gate, width):
        return float((tiles * gate).sum() * width * B)

    cur = {
        "density+rho* x4": 4 * pairs(t_main, own_nonb | win_mv, ccol),
        "viscsurf+paccel x4": 4 * pairs(t_main, own_nonb, ccol),
        "boundary x1": pairs(t_bnd, own_nonb & win_b, ccol_c),
    }

    # ---------------- redesign: moving-compact + shell ------------------
    # own pack = [moving rows | shell rows] (each block-padded); columns =
    # same pack; moving blocks stream (moving chunks + shell chunks),
    # shell blocks stream moving chunks only (their wall-wall part is a
    # static per-site constant); force passes zero shell blocks.
    pen_mov = pencil_s[mov_s]
    pstart_mov = np.searchsorted(pen_mov, np.arange(npen + 1))
    t_mm, nb_mov = block_tiles(pen_mov, npen, nx, pstart_mov, B, ccol)
    # moving blocks' shell chunks: full-space windows of the MOVING
    # blocks -> searchsorted into shell rows
    rows_sh_sorted = np.flatnonzero(shell_s)
    t_ms, _ = subset_tiles(pen_mov, npen, nx, rows_sh_sorted, B, ccol_c)
    # NOTE subset_tiles derives full-space windows from pen_mov's own
    # pstart (moving rows') — windows are pencil ranges, identical in any
    # column space; pstart inside maps them to full rows, then to shell.
    # shell blocks' moving chunks:
    pen_sh = pencil_s[shell_s]
    t_sm, nb_sh = subset_tiles(pen_sh, npen, nx,
                               np.flatnonzero(mov_s), B, ccol)
    # express shell-block windows in moving-compact space instead:
    t_sm2, _ = block_tiles(pen_sh, npen, nx, pstart_mov, B, ccol)

    new = {
        "density+rho* x4 (mov own: mov+shell cols)":
            4 * (pairs(t_mm, np.ones(nb_mov, bool), ccol)
                 + pairs(t_ms, np.ones(nb_mov, bool), ccol_c)),
        "density+rho* x4 (shell own: mov cols)":
            4 * pairs(t_sm2, np.ones(nb_sh, bool), ccol),
        "viscsurf+paccel x4 (mov own: mov+shell cols)":
            4 * (pairs(t_mm, np.ones(nb_mov, bool), ccol)
                 + pairs(t_ms, np.ones(nb_mov, bool), ccol_c)),
        "boundary x1 (mov own: shell cols)":
            pairs(t_ms, np.ones(nb_mov, bool), ccol_c),
    }

    print(f"\nblocks: current {nb} -> moving {nb_mov} + shell {nb_sh}")
    print(f"{'pass family':48s} {'Gpair-slots/step':>16s}")
    tot_c = 0.0
    for k, v in cur.items():
        print(f"  CURRENT  {k:39s} {v/1e9:16.2f}")
        tot_c += v
    print(f"  CURRENT  {'TOTAL':39s} {tot_c/1e9:16.2f}")
    tot_n = 0.0
    for k, v in new.items():
        print(f"  REDESIGN {k:39s} {v/1e9:16.2f}")
        tot_n += v
    print(f"  REDESIGN {'TOTAL':39s} {tot_n/1e9:16.2f}")
    print(f"\npair-slot ratio (redesign/current): {tot_n/tot_c:.3f}")

    # tile-width sweep for the new layout (moving slab ccol x shell ccol)
    print("\nccol sweep (Gpair-slots/step + tiles, redesign totals):")
    for cm in (256, 512, 1024):
        t_mm2, _ = block_tiles(pen_mov, npen, nx, pstart_mov, B, cm)
        t_sm3, _ = block_tiles(pen_sh, npen, nx, pstart_mov, B, cm)
        for cs in (128, 256):
            t_ms2, _ = subset_tiles(pen_mov, npen, nx, rows_sh_sorted,
                                    B, cs)
            g = (8 * t_mm2.sum() * cm + 9 * t_ms2.sum() * cs
                 + 4 * t_sm3.sum() * cm) * B
            tl = 8 * t_mm2.sum() + 9 * t_ms2.sum() + 4 * t_sm3.sum()
            print(f"  mov ccol={cm:5d} shell ccol={cs:4d}: "
                  f"{g/1e9:6.2f} G  tiles {tl}")
    # fixed-cost proxy: tiles are the other measured cost driver (r4:
    # per-tile fixed compute ~42% of step at ccol=256)
    tiles_c = 4 * (t_main * (own_nonb | win_mv)).sum() \
        + 4 * (t_main * own_nonb).sum() \
        + (t_bnd * (own_nonb & win_b)).sum()
    tiles_n = 8 * t_mm.sum() + 8 * t_ms.sum() + 4 * t_sm2.sum() \
        + t_ms.sum()
    print(f"tile ratio (redesign/current): {tiles_n/tiles_c:.3f} "
          f"({tiles_c} -> {tiles_n} tile-computes/step)")


if __name__ == "__main__":
    main()
