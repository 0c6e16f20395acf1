"""Per-resort collective traffic: replicated vs distributed resort.

Counts bytes RECEIVED per device per resort for both halo-engine resort
implementations (parallel/halo.py), from scene/config shapes — the
collectives are statically shaped, so this is exact, not an estimate.
Recorded in BASELINE.md (round 4). Run on any backend:

    PYTHONPATH=. python scripts/resort_bytes.py [--ndev 8]
"""
import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndev", type=int, default=8)
    args = ap.parse_args()

    import os
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")

    import math
    from sph_tpu.config import SimParams
    from sph_tpu.core.fast import compute_fast_config
    from sph_tpu.parallel.halo import measure_halo_pad
    from sph_tpu.parallel.mesh import pad_scene_to_devices
    from sph_tpu.scene import generate_worm_scene

    params = SimParams()  # full-size worm world (the bench scene)
    scene = generate_worm_scene(params)
    D = args.ndev
    block = 256
    bm = math.lcm(8, D)
    cfg = compute_fast_config(scene.pos, params, block=block,
                              block_multiple=bm)
    scene = pad_scene_to_devices(scene, D * block)
    cfg = compute_fast_config(scene.pos, params, block=block,
                              block_multiple=bm)
    n = cfg.n_particles
    nx, ny, nz = cfg.dims
    npen = cfg.n_pencils
    n_cells = ny * npen
    halo_pad = min(measure_halo_pad(scene.pos, params, cfg),
                   cfg.n_blocks // D * cfg.block)
    mig_cap = halo_pad
    lay = scene.layout()
    n_el = lay.n_elastic
    recv = (D - 1) / D  # tiled all_gather: fraction received per device

    # replicated resort: all_gather pos/vel/normal (3x3) + ptype = 10
    # arrays of [n] f32/int32 in, plus the sweep-end re-globalization of
    # 6 sorted field arrays of [n_pad] (pos/vel out)
    rep_in = 10 * n * 4 * recv
    rep_out = 6 * cfg.n_pad * 4 * recv
    print(f"worm n={n} n_pad={cfg.n_pad} dims=({nx},{ny},{nz}) "
          f"npen={npen} n_cells={n_cells} n_el={n_el} D={D} "
          f"halo_pad={halo_pad}")
    print(f"replicated resort: {rep_in/1e6:.2f} MB in + "
          f"{rep_out/1e6:.2f} MB out = {(rep_in+rep_out)/1e6:.2f} "
          f"MB/device/resort")

    # distributed resort (per resort, per device):
    #   all_gather [D, n_cells] int32 histogram
    hist = D * n_cells * 4 * recv
    #   migration: 2 directions x (6 f32 + 2 int32) x mig_cap ppermutes
    mig = 2 * 8 * mig_cap * 4
    #   psums: seg_b + seg_m [npen+1] f32, el_rows [n_el+1] int32
    psums = (2 * (npen + 1) + (n_el + 1)) * 4
    dist = hist + mig + psums
    print(f"distributed resort: histogram {hist/1e6:.2f} MB + "
          f"migration {mig/1e6:.2f} MB + psums {psums/1e6:.2f} MB = "
          f"{dist/1e6:.2f} MB/device/resort "
          f"(entry/exit O(N) paid once per jitted call: "
          f"{(9*n*4*recv)/1e6:.2f} MB in + {(7*cfg.n_pad*4*recv)/1e6:.2f}"
          f" MB out)")
    print(f"ratio (replicated / distributed): "
          f"{(rep_in+rep_out)/dist:.2f}x")


if __name__ == "__main__":
    main()
