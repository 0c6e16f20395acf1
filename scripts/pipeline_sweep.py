"""Flat-tile-ring sweep: (DMA ring depth, ccol) of the fast engine's
deep-pipelined pair passes on the worm, on the real chip.

STATUS: live instrument (r4). The r4 on-chip sub_sweep decomposed the
41.3 ms step into ~17.5 ms per-tile fixed cost (DMA issue/wait stalls at
depth 2 + per-sub-block pipeline refills) and ~23.8 ms per-column VPU
work (BASELINE.md r4). The flat tile table + continuous DMA ring
(ops/pair_kernels._make_pass) attacks the first term; this sweep
measures ms/step vs ring depth and tile width, and writes the winner to
results/r4/best_config.json (consumed by bench.py).

Run on the real chip:  python scripts/pipeline_sweep.py [chunk]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "r4")

# (depth, ccol, ccol_c) — ccol_c: compact-pass (boundary/spring/membrane)
# tile width; the boundary pass measured 8.6 ms at main ccol 512 vs ~3 at
# 256 (r4 chip ablation)
CONFIGS = [
    (8, 512, 256),
    (8, 512, 128),
    (8, 256, 128),
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
    for depth, ccol, ccol_c in CONFIGS:
        os.environ["SPH_TPU_DMA_DEPTH"] = str(depth)
        try:
            cfg = compute_fast_config(scene.pos, params, block=256,
                                      ccol=ccol, ccol_c=ccol_c,
                                      resort_every=30)
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
            print(f"depth={depth} ccol={ccol}: FAILED {e!r}", flush=True)
            continue
        print(f"depth={depth} ccol={ccol} ccol_c={ccol_c}: "
              f"compile {compile_s:.1f}s, {ms:.2f} ms/step, "
              f"{pps/1e6:.2f}M psteps/s, finite={fin}", flush=True)
        rows.append({"block": 256, "ccol": ccol, "sub": None, "depth": depth,
                     "ccol_c": ccol_c, "ms_per_step": ms,
                     "psteps_per_s": pps, "compile_s": compile_s,
                     "finite": fin})

    os.makedirs(RES, exist_ok=True)
    json.dump(rows, open(os.path.join(RES, "pipeline_sweep.json"), "w"),
              indent=1)
    good = [r for r in rows if r["finite"]]
    if good and on_tpu:
        # compare against the previously recorded best so a losing sweep
        # can never regress the bench config
        prev = os.path.join(RES, "best_config.json")
        if os.path.exists(prev):
            try:
                good.append(json.load(open(prev)))
            except Exception:
                pass
        best = min(good, key=lambda r: r["ms_per_step"])
        json.dump(best, open(os.path.join(RES, "best_config.json"), "w"))
        print("best:", best, flush=True)
    elif not on_tpu:
        print("not on TPU — best_config.json NOT written", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
