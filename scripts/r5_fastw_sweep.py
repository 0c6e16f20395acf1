"""On-chip (block, ccol, ccol_c) sweep for the wall-compact engine.

STATUS: live instrument (r5). The r4 sweep tuned the FAST engine to
(256, 512, ccol_c=256); fastw changes the row/column populations (512
moving blocks + 208 shell blocks vs 908; main-pass columns are moving
rows only), so the optimum can differ — notably ccol=1024 was untried
in r4 (VERDICT r4 #3). Writes results/r5/fastw_sweep.json and, if a
config beats the incumbent, results/r5/best_config.json (consumed by
bench.py when SPH_BENCH_ENGINE=fastw).

Run: python scripts/r5_fastw_sweep.py [quick]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "results", "r5")


def sync(s):
    return float(np.asarray(s.pos[0]).sum())


def main():
    os.makedirs(OUT, exist_ok=True)
    os.environ.setdefault("SPH_TPU_DMA_DEPTH", "8")
    import jax

    from sph_tpu.config import SimParams
    from sph_tpu.core.fastw import (
        compute_fastw_config,
        make_fastw_multi_step,
    )
    from sph_tpu.scene import generate_worm_scene

    params = SimParams()
    scene = generate_worm_scene(params)
    n = scene.n_particles
    print(f"scene: {n} particles, device={jax.devices()[0]}", flush=True)
    state0, springs, membranes = scene.device_state()
    layout = scene.layout()

    # (block, ccol, ccol_c); incumbent first as the reference point
    configs = [
        (256, 512, 256),
        (256, 1024, 256),
        (256, 512, 128),
        (256, 1024, 512),
        (128, 512, 256),
        (256, 512, 512),
    ]
    if "quick" in sys.argv:
        configs = configs[:3]

    chunk = 30
    rows = []
    for block, ccol, ccol_c in configs:
        tag = f"b{block}/c{ccol}/cc{ccol_c}"
        try:
            cfg = compute_fastw_config(
                scene.pos, params, layout, ptype=scene.ptype,
                block=block, ccol=ccol, ccol_c=ccol_c, resort_every=30)
            run = make_fastw_multi_step(params, layout, cfg, chunk)
            t0 = time.time()
            state = run(state0, springs, membranes)
            sync(state)
            compile_s = time.time() - t0
            t0 = time.time()
            reps = 0
            while reps < 3 and time.time() - t0 < 90:
                state = run(state, springs, membranes)
                sync(state)
                reps += 1
            wall = time.time() - t0
            ms = wall / (reps * chunk) * 1e3
            pps = n * reps * chunk / wall
            fin = bool(np.isfinite(np.asarray(state.pos)).all())
            print(f"{tag}: compile {compile_s:.1f}s, {ms:.2f} ms/step, "
                  f"{pps/1e6:.2f}M p-steps/s, finite={fin}", flush=True)
            rows.append(dict(block=block, ccol=ccol, ccol_c=ccol_c,
                             ms_per_step=ms, psteps_per_s=pps,
                             compile_s=compile_s, finite=fin))
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            rows.append(dict(block=block, ccol=ccol, ccol_c=ccol_c,
                             error=str(e)[:200]))
        with open(os.path.join(OUT, "fastw_sweep.json"), "w") as f:
            json.dump(rows, f, indent=1)

    good = [r for r in rows if r.get("finite")]
    if good:
        best = min(good, key=lambda r: r["ms_per_step"])
        best = dict(best, engine="fastw",
                    depth=int(os.environ["SPH_TPU_DMA_DEPTH"]))
        print(f"BEST: {best}", flush=True)
        with open(os.path.join(OUT, "best_config.json"), "w") as f:
            json.dump(best, f, indent=1)


if __name__ == "__main__":
    main()
