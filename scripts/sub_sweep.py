"""Gated-config sweep: (block, ccol, sub) of the subgroup-gated fast
engine on the worm, on the real chip.

STATUS: live instrument (r4). The gating win depends on tile width:
measured computed-candidate columns/particle on the worm
(scripts/r3_window_analysis.py) are 1,617 ungated (ccol=256), 1,179 at
sub=32/ccol=256, 819 at sub=32/ccol=128, 744 at sub=8/ccol=128 — but
narrower tiles mean more per-tile overhead and shorter DMA bursts, so
the ms/step winner must be measured. Writes every timing to
results/r4/sub_sweep.json and the winner to results/r4/best_config.json,
which bench.py picks up for the headline run.

Run on the real chip:  python scripts/sub_sweep.py [chunk]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "r4")

# (block, ccol, sub); sub=None = ungated baseline
CONFIGS = [
    (256, 256, None),
    (256, 256, 32),
    (256, 128, 32),
    (256, 128, 16),
    (256, 128, 8),
    (256, 128, None),
]


def main():
    import jax
    from sph_tpu.config import SimParams
    from sph_tpu.core.fast import compute_fast_config, make_fast_multi_step
    from sph_tpu.scene import generate_worm_scene

    dev = jax.devices()[0]
    on_tpu = (jax.default_backend() in ("tpu", "axon")
              or "TPU" in getattr(dev, "device_kind", ""))
    print(f"backend: {jax.default_backend()} ({dev})", flush=True)

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    params = SimParams()
    t0 = time.time()
    scene = generate_worm_scene(params)
    n = scene.n_particles
    print(f"scene: {n} particles, build {time.time()-t0:.1f}s", flush=True)
    state0, springs, membranes = scene.device_state()
    layout = scene.layout()

    def sync(s):
        return float(np.asarray(s.pos[0]).sum())

    rows = []
    for block, ccol, sub in CONFIGS:
        try:
            cfg = compute_fast_config(scene.pos, params, block=block,
                                      ccol=ccol, resort_every=30, sub=sub)
            run = make_fast_multi_step(params, layout, cfg, chunk)
            t0 = time.time()
            state = run(state0, springs, membranes)
            sync(state)
            compile_s = time.time() - t0
            t0 = time.time()
            reps = 0
            while reps < 5 and time.time() - t0 < 90:
                state = run(state, springs, membranes)
                sync(state)
                reps += 1
            wall = time.time() - t0
            ms = wall / (reps * chunk) * 1e3
            pps = n * reps * chunk / wall
            fin = bool(np.isfinite(np.asarray(state.pos)).all())
        except Exception as e:  # keep sweeping on a single-config failure
            print(f"block={block} ccol={ccol} sub={sub}: FAILED {e!r}",
                  flush=True)
            continue
        print(f"block={block} ccol={ccol} sub={sub}: compile {compile_s:.1f}s,"
              f" {ms:.2f} ms/step, {pps/1e6:.2f}M psteps/s, finite={fin}",
              flush=True)
        rows.append({"block": block, "ccol": ccol, "sub": sub,
                     "ms_per_step": ms, "psteps_per_s": pps,
                     "compile_s": compile_s, "finite": fin})

    os.makedirs(RES, exist_ok=True)
    json.dump(rows, open(os.path.join(RES, "sub_sweep.json"), "w"), indent=1)
    good = [r for r in rows if r["finite"]]
    if good and on_tpu:
        best = min(good, key=lambda r: r["ms_per_step"])
        json.dump(best, open(os.path.join(RES, "best_config.json"), "w"))
        print("best:", best, flush=True)
    elif not on_tpu:
        print("not on TPU — best_config.json NOT written", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
