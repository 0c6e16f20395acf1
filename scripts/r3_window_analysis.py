"""Round-3 pruning design analysis: computed candidate columns/particle for

STATUS: live instrument. Measures computed candidate columns/particle per layout variant; produced the 1,617 -> 819 (sub=32) numbers behind the r4 subgroup gating (BASELINE.md r4).
per-own-subgroup windows with tile-granularity skipping, on the real worm
scene — sizes the win before kernel work.

Design under test: own block B (DMA/output granularity) is split into
``B/S`` subgroups of S consecutive sorted rows; each subgroup g gets its own
per-dz-chunk candidate range [lo_g, hi_g) (pencils [first_g-1, last_g+2) x
dz band). The slab stream stays the block-level union window (tiles of
``ccol``); per (tile, subgroup) compute is skipped when the tile's column
range misses [lo_g, hi_g). Computed area = sum over subgroups of
overlapping-tile columns x S.

Run: python scripts/r3_window_analysis.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ALIGN = 128


def build_scene():
    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene

    params = SimParams()
    t0 = time.time()
    scene = generate_worm_scene(params)
    print(f"scene: {scene.n_particles} particles, "
          f"build {time.time()-t0:.1f}s", flush=True)
    return params, np.asarray(scene.pos)


def pencil_sort(pos, params, cell):
    """fast.py order: z-major, x-pencil, y-run."""
    lo = np.asarray(params.box_min)
    nx = int((params.x_max - params.x_min) / cell) + 1
    ny = int((params.y_max - params.y_min) / cell) + 1
    nz = int((params.z_max - params.z_min) / cell) + 1
    c = np.clip(((pos - lo) / cell).astype(np.int64), 0,
                [nx - 1, ny - 1, nz - 1])
    pencil = c[:, 0] + nx * c[:, 2]
    cid = c[:, 1] + ny * pencil
    order = np.argsort(cid, kind="stable")
    return order, pencil[order], c[order], (nx, ny, nz)


def subgroup_windows(pos, params, *, B, S, ccol, cell, name=""):
    order, pencil_s, cs, (nx, ny, nz) = pencil_sort(pos, params, cell)
    n = len(pos)
    npen = nx * nz
    pstart = np.searchsorted(pencil_s, np.arange(npen + 1))
    nb = -(-n // B)
    n_pad = nb * B
    pencil_pad = np.concatenate(
        [pencil_s, np.full(n_pad - n, pencil_s[-1])])
    # block-level union window (the DMA stream), current scheme
    first_b = pencil_pad[np.arange(nb) * B]
    last_b = pencil_pad[np.arange(nb) * B + B - 1]
    # subgroup-level ranges
    ng = B // S
    first_g = pencil_pad[np.arange(nb * ng) * S].reshape(nb, ng)
    last_g = pencil_pad[np.arange(nb * ng) * S + S - 1].reshape(nb, ng)

    streamed = 0   # DMA'd columns (block-level)
    computed = 0   # computed columns x S rows, per subgroup
    prev_hi = np.zeros(nb, np.int64)
    for dz in (-1, 0, 1):
        lo_p = np.clip(first_b + dz * nx - 1, 0, npen)
        hi_p = np.clip(last_b + dz * nx + 2, 0, npen)
        lo_p = np.maximum(lo_p, prev_hi)
        hi_p = np.maximum(hi_p, lo_p)
        prev_hi = hi_p
        off = pstart[lo_p]
        end = pstart[hi_p]
        aligned = (off // ALIGN) * ALIGN
        ntile = np.where(end > aligned, -((aligned - end) // ccol), 0)
        streamed += (ntile * ccol).sum()
        # subgroup candidate ranges inside this chunk
        lo_g = pstart[np.clip(first_g + dz * nx - 1, 0, npen)]
        hi_g = pstart[np.clip(last_g + dz * nx + 2, 0, npen)]
        # clip to the chunk itself (tiles only exist there)
        lo_g = np.maximum(lo_g, off[:, None])
        hi_g = np.minimum(hi_g, end[:, None])
        # overlapping tiles: tile t covers [aligned + t*ccol, +ccol)
        t_lo = np.maximum((lo_g - aligned[:, None]) // ccol, 0)
        t_hi = np.where(
            hi_g > lo_g,
            -((aligned[:, None] - hi_g) // ccol), t_lo)
        t_hi = np.minimum(t_hi, ntile[:, None])
        computed += (np.maximum(t_hi - t_lo, 0) * ccol).sum() * S
    print(f"{name:34s} B={B:4d} S={S:3d} ccol={ccol:4d}: "
          f"streamed/col={streamed / n:7.0f}  "
          f"computed/particle={computed / (n_pad):7.0f}", flush=True)
    return computed / n_pad


def current_scheme(pos, params, *, B, ccol, cell):
    return subgroup_windows(pos, params, B=B, S=B, ccol=ccol, cell=cell,
                            name="current (S=B)")


def compact_cell_tiles(pos, params, cell, name=""):
    """VERDICT r3 #1(a): cell-capacity compact tiles, MEASURED (the r3
    dismissal was an estimate). Pad every occupied ``cell``-sized grid
    cell to the scene capacity K; a tile = one cell's K rows; its
    candidate window = the 27 neighboring cells x K columns. Reports the
    real K, the padding factor (padded rows / real particles), and the
    resulting computed candidates/particle for (i) per-tile 27-cell
    windows and (ii) the per-particle 8-cell gather bound (the
    reference's own scheme, sphFluid.cl:266-271 — NOT expressible at
    tile granularity, shown as the gather lower bound)."""
    lo = np.asarray(params.box_min)
    nx = int((params.x_max - params.x_min) / cell) + 1
    ny = int((params.y_max - params.y_min) / cell) + 1
    nz = int((params.z_max - params.z_min) / cell) + 1
    c = np.clip(((pos - lo) / cell).astype(np.int64), 0,
                [nx - 1, ny - 1, nz - 1])
    cid = (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0]
    occ = np.bincount(cid, minlength=nx * ny * nz)
    occupied = occ > 0
    K = int(occ.max())
    mean_occ = float(occ[occupied].mean())
    pad = K / mean_occ
    # window = (2*reach+1)^3 cells where reach = ceil(support/cell)
    # (27 for cell >= h, 125 for h/2, ...); K-padded: every real
    # particle computes against win*K candidate columns; padded rows
    # also burn VPU lanes -> effective candidates per REAL particle =
    # win*K * (K/mean_occ).
    reach = int(np.ceil(params.h / cell))
    win = (2 * reach + 1) ** 3
    cand_tile = win * K * pad
    # per-particle window bound: a length-2h interval touches at most
    # int(2h/cell)+1 cells per axis when the particle position is known
    # (= the reference's 8-cell corner trick at cell=2h,
    # sphFluid.cl:266-271); needs per-particle gather, not tiles.
    ga = int(2 * params.h / cell) + 1
    cand_gather = ga ** 3 * K
    # occupancy histogram tail: K driven by how many cells?
    q = np.quantile(occ[occupied], [0.5, 0.9, 0.99, 1.0])
    print(f"{name:34s} cell={cell:5.2f}: K={K:4d} mean_occ={mean_occ:6.1f} "
          f"pad={pad:4.1f}x  occ q50/90/99/max={q.astype(int).tolist()}  "
          f"computed/particle tile{win}={cand_tile:7.0f} "
          f"gather{ga}^3={cand_gather:6.0f}", flush=True)
    return cand_tile


def main():
    params, pos = build_scene()
    h = params.h
    compact_cell_tiles(pos, params, cell=2 * h, name="compact cells (2h)")
    compact_cell_tiles(pos, params, cell=h, name="compact cells (h)")
    compact_cell_tiles(pos, params, cell=h / 2, name="compact cells (h/2)")
    current_scheme(pos, params, B=256, ccol=256, cell=h)
    for B, S, ccol in [(256, 128, 256), (256, 64, 256), (256, 32, 256),
                       (256, 64, 128), (256, 32, 128), (256, 16, 128),
                       (256, 8, 128),
                       (512, 32, 128), (512, 64, 128),
                       (128, 32, 128), (128, 16, 128),
                       (256, 8, 256)]:
        subgroup_windows(pos, params, B=B, S=S, ccol=ccol, cell=h,
                         name="subgroup-skip")


if __name__ == "__main__":
    main()
