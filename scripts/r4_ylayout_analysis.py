"""Round-4 candidate-layout analysis: the (z, y-coarse, x, y) sort key.

STATUS: live instrument (r4). Measures computed candidate columns per
particle for a FINER pencil decomposition than the shipped (z, x, y)
key: cells are grouped into y-segments of ``gy`` cells, and the sort
key becomes (z, y_seg, x, y) — a "pencil" is then (z, y_seg, x), only
``gy`` cells tall. A block's interaction window generalizes from 3
pencil bands to (z-extent + 2) x (y_seg overlap) bands, each still a
SINGLE CONTIGUOUS sorted-array range (the property the maskless tile
machinery needs). This is the r3 speed-of-light analysis's named
"scene-adaptive block/pencil geometry" path: the shipped layout streams
full-height y-pencils (the worm pool occupies a thin y slab, so ~7x of
every window is y-waste the 27-cell ideal would not pay).

Unlike per-pencil y-clipping at the old key (REFUTED: 9 non-contiguous
windows x 128-lane minimum = ~1,150 floor), y-clipping here happens at
the sort-key level, so the per-(z,y_seg) x-ranges stay contiguous and
the window count stays small (typically 3 x 2 = 6).

Reports, per (gy, block, ccol): computed candidate columns/particle
(tile-quantized, alignment included — the exact quantity the VPU pays),
streamed DMA columns, and mean tiles/block (the issue-count proxy).
gy=None reproduces the shipped layout (validates against the recorded
1,617 at B=256/ccol=256).

Run: python scripts/r4_ylayout_analysis.py
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


def grid_dims(params, cell):
    nx = int((params.x_max - params.x_min) / cell) + 1
    ny = int((params.y_max - params.y_min) / cell) + 1
    nz = int((params.z_max - params.z_min) / cell) + 1
    return nx, ny, nz


def ylayout_candidates(pos, params, *, gy, B, ccol, cell, name=""):
    """Candidate columns/particle under sort key (z, y//gy, x, y).

    gy=None (or gy >= ny) = the shipped (z, x, y) key.
    """
    nx, ny, nz = grid_dims(params, cell)
    lo = np.asarray(params.box_min)
    c = np.clip(((pos - lo) / cell).astype(np.int64), 0,
                [nx - 1, ny - 1, nz - 1])
    if gy is None:
        gy = ny
    nyc = -(-ny // gy)
    yc = c[:, 1] // gy
    # pencil = (z, yc, x); within-pencil order by y cell
    pencil = c[:, 0] + nx * (yc + nyc * c[:, 2])
    cid = c[:, 1] + ny * pencil
    order = np.argsort(cid, kind="stable")
    cs = c[order]
    pencil_s = pencil[order]

    n = len(pos)
    npen = nx * nyc * nz
    pstart = np.searchsorted(pencil_s, np.arange(npen + 1))
    nb = -(-n // B)
    n_pad = nb * B

    def padded(a, fill):
        return np.concatenate([a, np.full(n_pad - n, fill, a.dtype)])

    bz = padded(cs[:, 2], cs[-1, 2]).reshape(nb, B)
    bx = padded(cs[:, 0], cs[-1, 0]).reshape(nb, B)
    by = padded(cs[:, 1], cs[-1, 1]).reshape(nb, B)
    zmin, zmax = bz.min(1), bz.max(1)
    xmin, xmax = bx.min(1), bx.max(1)
    ymin, ymax = by.min(1), by.max(1)
    # y cells the window must reach: [ymin-1, ymax+1] -> y segments
    yc_lo = np.clip((ymin - 1) // gy, 0, nyc - 1)
    yc_hi = np.clip((ymax + 1) // gy, 0, nyc - 1)
    z_lo, z_hi = np.maximum(zmin - 1, 0), np.minimum(zmax + 1, nz - 1)

    max_zw = int((z_hi - z_lo).max()) + 1
    max_yw = int((yc_hi - yc_lo).max()) + 1

    streamed = np.zeros(nb, np.int64)
    tiles = np.zeros(nb, np.int64)
    prev_tend = np.zeros(nb, np.int64)
    n_win = 0
    for iz in range(max_zw):
        z = z_lo + iz
        alive_z = z <= z_hi
        for iy in range(max_yw):
            ycw = yc_lo + iy
            alive = alive_z & (ycw <= yc_hi)
            p_lo = (np.clip(xmin - 1, 0, nx) + nx * (ycw + nyc * z))
            p_hi = (np.clip(xmax + 2, 0, nx) + nx * (ycw + nyc * z))
            off = np.where(alive, pstart[np.clip(p_lo, 0, npen)], 0)
            end = np.where(alive, pstart[np.clip(p_hi, 0, npen)], 0)
            aligned = np.maximum((off // ALIGN) * ALIGN, prev_tend)
            ntile = np.where(alive & (end > aligned),
                             -((aligned - end) // ccol), 0)
            prev_tend = np.where(alive, aligned + ntile * ccol, prev_tend)
            streamed += ntile * ccol
            tiles += ntile
            n_win += 1
    # every own row computes every tile column -> per-particle candidate
    # columns = mean streamed columns per block (each block has B rows)
    computed = streamed.sum() / nb
    print(f"{name:22s} gy={gy if gy < ny else 'inf':>4} B={B:4d} "
          f"ccol={ccol:4d}: computed/particle={computed:7.0f}  "
          f"tiles/block={tiles.mean():5.2f} (max {tiles.max():3d})  "
          f"windows<={max_zw}x{max_yw}", flush=True)
    return computed, tiles.mean()


def main():
    params, pos = build_scene()
    h = params.h
    # shipped layout sanity anchor (expect ~1,617 at B=256/ccol=256)
    ylayout_candidates(pos, params, gy=None, B=256, ccol=256, cell=h,
                       name="shipped (z,x,y)")
    ylayout_candidates(pos, params, gy=None, B=256, ccol=128, cell=h,
                       name="shipped (z,x,y)")
    for gy in (8, 6, 5, 4, 3, 2):
        for B in (256, 128):
            for ccol in (256, 128):
                ylayout_candidates(pos, params, gy=gy, B=B, ccol=ccol,
                                   cell=h, name="y-seg key")


if __name__ == "__main__":
    main()
