"""Offline analysis: padded pair-candidates per particle for slab-window

STATUS: closed exploration (r2). Padded-candidate counts for the original slab-window design; superseded by r3_window_analysis.py (maskless tiles).
design variants of the fast engine, measured on the real worm scene.

Run: python scripts/window_analysis.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_scene():
    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene

    params = SimParams()
    t0 = time.time()
    scene = generate_worm_scene(params)
    print(f"scene: {scene.n_particles} particles, build {time.time()-t0:.1f}s")
    return params, np.asarray(scene.pos)


def pencil_sort(pos, params, cell):
    nx = int((params.x_max - params.x_min) / cell) + 1
    ny = int((params.y_max - params.y_min) / cell) + 1
    nz = int((params.z_max - params.z_min) / cell) + 1
    c = np.clip(((pos - np.asarray(params.box_min)) / cell).astype(np.int64),
                0, [nx - 1, ny - 1, nz - 1])
    pencil = c[:, 1] + ny * c[:, 2]
    cid = c[:, 0] + nx * pencil
    order = np.argsort(cid, kind="stable")
    return order, pencil[order], c[order], (nx, ny, nz)


def variant_pencil_bands(pos, params, *, B, ALIGN, cell, margin_p=1,
                         name=""):
    """Per-block windows = 3 dz pencil bands [first-m, last+m], ALIGN-aligned.
    Returns avg candidates per particle (incl. alignment waste)."""
    order, pencil_s, cs, (nx, ny, nz) = pencil_sort(pos, params, cell)
    n = len(pos)
    npen = ny * nz
    pstart = np.searchsorted(pencil_s, np.arange(npen + 1))
    nb = -(-n // B)
    first = pencil_s[np.minimum(np.arange(nb) * B, n - 1)]
    last = pencil_s[np.minimum(np.arange(nb) * B + B - 1, n - 1)]
    total = 0
    cmax = 0
    prev_hi = np.zeros(nb, np.int64)
    for dz in (-1, 0, 1):
        lo = np.clip(first + dz * ny - margin_p, 0, npen)
        hi = np.clip(last + dz * ny + margin_p + 1, 0, npen)
        lo = np.maximum(lo, prev_hi)
        hi = np.maximum(hi, lo)
        prev_hi = hi
        off = pstart[lo]
        end = pstart[hi]
        aligned = (off // ALIGN) * ALIGN
        span = np.ceil((end - aligned) / ALIGN).astype(np.int64) * ALIGN
        span = np.where(end > aligned, span, 0)
        total += span.sum() * B  # every own particle scans the whole window
        cmax = max(cmax, int((end - aligned).max()))
    # last block is partially real; count real particles only
    print(f"{name:40s} B={B:5d} ALIGN={ALIGN:4d} cell={cell:.2f} "
          f"pairs/particle={total / n / B * B / n if False else total / (nb * B):9.0f} "
          f"ccap_needed={cmax}")
    return total / (nb * B)


def variant_subtile_skip(pos, params, *, B, ALIGN, cell, sub, name=""):
    """Like pencil bands, but skip `sub`-wide column subtiles whose cid range
    cannot contain any cell within the own block's dilated (27-cell) set.
    Conservative: subtile kept if [its min cid window] intersects own
    dilated cells. Uses per-subtile cid range from the sorted array."""
    order, pencil_s, cs, (nx, ny, nz) = pencil_sort(pos, params, cell)
    n = len(pos)
    npen = ny * nz
    cid_s = cs[:, 0] + nx * pencil_s
    pstart = np.searchsorted(pencil_s, np.arange(npen + 1))
    nb = -(-n // B)
    first = pencil_s[np.minimum(np.arange(nb) * B, n - 1)]
    last = pencil_s[np.minimum(np.arange(nb) * B + B - 1, n - 1)]
    # own block x-range per block (global over the block)
    xmin = np.array([cs[b * B:min((b + 1) * B, n), 0].min() for b in range(nb)])
    xmax = np.array([cs[b * B:min((b + 1) * B, n), 0].max() for b in range(nb)])
    total = 0
    kept_total = 0
    prev_hi = np.zeros(nb, np.int64)
    for dz in (-1, 0, 1):
        lo = np.clip(first + dz * ny - 1, 0, npen)
        hi = np.clip(last + dz * ny + 2, 0, npen)
        lo = np.maximum(lo, prev_hi)
        hi = np.maximum(hi, lo)
        prev_hi = hi
        off = pstart[lo]
        end = pstart[hi]
        aligned = (off // ALIGN) * ALIGN
        for b in range(nb):
            a, e = aligned[b], end[b]
            if e <= a:
                continue
            nsub = -(-(e - a) // sub)
            total += nsub * sub
            for s in range(nsub):
                s0, s1 = a + s * sub, min(a + (s + 1) * sub, n)
                if s1 <= s0:
                    kept_total += sub
                    continue
                # subtile's pencil+x content vs own dilated set
                sp = pencil_s[s0:s1]
                sxc = cs[s0:s1, 0]
                # own dilated: pencil in [first-?..], x in [xmin-1, xmax+1]
                # pencil test: any sp such that sp - dz*ny in [first-1,last+1]
                pok = (sp >= lo[b]) & (sp < hi[b])
                xok = (sxc >= xmin[b] - 1) & (sxc <= xmax[b] + 1)
                if (pok & xok).any():
                    kept_total += sub
    print(f"{name:40s} B={B:5d} sub={sub:4d} "
          f"pairs/particle={kept_total / (nb * B):9.0f} "
          f"(unskipped {total / (nb * B):.0f})")
    return kept_total / (nb * B)


def ideal_27cell(pos, params, cell):
    order, pencil_s, cs, (nx, ny, nz) = pencil_sort(pos, params, cell)
    # candidates per particle = occupancy of its 27-cell neighborhood
    cnt = np.zeros((nx, ny, nz), np.int64)
    np.add.at(cnt, (cs[:, 0], cs[:, 1], cs[:, 2]), 1)
    from scipy.ndimage import uniform_filter
    s = uniform_filter(cnt.astype(np.float64), size=3, mode="constant") * 27
    per = s[cs[:, 0], cs[:, 1], cs[:, 2]]
    print(f"{'ideal 27-cell (h)':40s} cell={cell:.2f} "
          f"pairs/particle={per.mean():9.0f}")


def real_neighbors(pos, params):
    from scipy.spatial import cKDTree
    t = cKDTree(pos)
    cnt = np.asarray(t.query_ball_point(pos[::97], params.h,
                                        return_length=True))
    print(f"{'real neighbors within h':40s} mean={cnt.mean():.1f} "
          f"max={cnt.max()}")


def main():
    params, pos = build_scene()
    h = params.h
    real_neighbors(pos, params)
    try:
        ideal_27cell(pos, params, h)
    except ImportError:
        pass
    variant_pencil_bands(pos, params, B=1024, ALIGN=1024, cell=h,
                         name="V0 current")
    variant_pencil_bands(pos, params, B=512, ALIGN=128, cell=h, name="V1a")
    variant_pencil_bands(pos, params, B=256, ALIGN=128, cell=h, name="V1b")
    variant_pencil_bands(pos, params, B=128, ALIGN=128, cell=h, name="V1c")
    variant_pencil_bands(pos, params, B=256, ALIGN=128, cell=2 * h,
                         name="V2 2h-pencils (drift-safe)")
    variant_pencil_bands(pos, params, B=512, ALIGN=128, cell=2 * h,
                         name="V2a 2h-pencils")
    variant_pencil_bands(pos, params, B=256, ALIGN=128, cell=h, margin_p=2,
                         name="V3 h-pencils margin2 (y only)")
    variant_subtile_skip(pos, params, B=256, ALIGN=128, cell=h, sub=128,
                         name="V4 B=256 + subtile-skip")
    variant_subtile_skip(pos, params, B=512, ALIGN=128, cell=h, sub=128,
                         name="V4a B=512 + subtile-skip")
    variant_subtile_skip(pos, params, B=1024, ALIGN=1024, cell=h, sub=512,
                         name="V4b current + subtile-skip")


if __name__ == "__main__":
    main()


def variant_tiles(pos, params, *, B, ccol, cell, axes, name=""):
    """Effective pairs/particle incl. ccol tile rounding and 128 alignment,
    for a given pencil definition. axes = (pencil_major, pencil_minor, run)
    as a permutation of (0,1,2) meaning sort key = (major, minor, run)."""
    a_maj, a_min, a_run = axes
    lo = np.asarray(params.box_min)
    hi = np.asarray(params.box_max)
    dims = ((hi - lo) / cell).astype(np.int64) + 1
    c = np.clip(((pos - lo) / cell).astype(np.int64), 0, dims - 1)
    n_min = dims[a_min]
    pencil = c[:, a_min] + n_min * c[:, a_maj]
    cid = c[:, a_run] + dims[a_run] * pencil
    order = np.argsort(cid, kind="stable")
    pencil_s = pencil[order]
    n = len(pos)
    npen = n_min * dims[a_maj]
    pstart = np.searchsorted(pencil_s, np.arange(npen + 1))
    nb = -(-n // B)
    first = pencil_s[np.minimum(np.arange(nb) * B, n - 1)]
    last = pencil_s[np.minimum(np.arange(nb) * B + B - 1, n - 1)]
    ALIGN = 128
    total_tiles = 0
    smax = 0
    ssum = 0
    prev_hi = np.zeros(nb, np.int64)
    for dmaj in (-1, 0, 1):
        lo_p = np.clip(first + dmaj * n_min - 1, 0, npen)
        hi_p = np.clip(last + dmaj * n_min + 2, 0, npen)
        lo_p = np.maximum(lo_p, prev_hi)
        hi_p = np.maximum(hi_p, lo_p)
        prev_hi = hi_p
        off = pstart[lo_p]
        end = pstart[hi_p]
        aligned = (off // ALIGN) * ALIGN
        nsub = np.where(end > aligned, -(-(end - aligned) // ccol), 0)
        total_tiles += nsub.sum()
        ssum += nsub
    smax = int(ssum.max())
    eff = total_tiles * ccol / (nb * B) * B / B
    print(f"{name:44s} B={B:4d} ccol={ccol:4d} "
          f"pairs/particle={total_tiles * ccol / (nb * B):7.0f} "
          f"tiles/block={total_tiles / nb:5.1f} s_max={smax} nb={nb}")


def main2():
    params, pos = build_scene()
    h = params.h
    # axes: coords are (x, y, z) = (0, 1, 2)
    for B in (128, 256, 512):
        for ccol in (256, 512):
            variant_tiles(pos, params, B=B, ccol=ccol, cell=h,
                          axes=(2, 1, 0), name="Z-major,y-pencil,x-run (cur)")
    for B in (128, 256, 512):
        for ccol in (256, 512):
            variant_tiles(pos, params, B=B, ccol=ccol, cell=h,
                          axes=(2, 0, 1), name="Z-major,x-pencil,y-run")


if __name__ == "__main__":
    import sys as _s
    if "--tiles" in _s.argv:
        main2()
    else:
        main()
