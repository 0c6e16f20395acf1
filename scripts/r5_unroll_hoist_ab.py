"""On-chip A/B of the r5 fastw upgrades: scan unroll + wall-static hoist.

STATUS: live instrument (r5). Three arms, all make_fastw_multi_step
chunk=30 / resort_every=30 at the tuned 256/512/ccol_c=256 shapes:
  1. unroll=1, in-jit wall path        (the 31.2 ms/step r5 baseline)
  2. unroll=5, in-jit wall path        (glue-hunt projection: -1.4 ms)
  3. unroll=5 + precompute_wall_static (resort diet: no wall argsort,
     no raw_sw pass per resort)
Also checks arm-3 vs arm-1 max|dpos| over one 30-step chunk (the hoist
changes only f32 summation order of the static wall-wall sums).

Run: python scripts/r5_unroll_hoist_ab.py
"""
import os
os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("SPH_TPU_DMA_DEPTH", "8")
import dataclasses
import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sph_tpu.config import SimParams
from sph_tpu.scene import generate_worm_scene
from sph_tpu.core.fastw import (
    compute_fastw_config, make_fastw_multi_step, precompute_wall_static)

CHUNK = 30

params = SimParams()
scene = generate_worm_scene(params)
state, springs, membranes = scene.device_state()
layout = scene.layout()
n = layout.n_particles

t0 = time.time()
cfg5 = compute_fastw_config(scene.pos, params, layout, ptype=scene.ptype,
                            block=256, ccol=512, ccol_c=256)
ws = precompute_wall_static(scene.pos, scene.normal, params, layout, cfg5)
host_s = time.time() - t0
cfg1 = dataclasses.replace(cfg5, unroll=1)
print(f"scene: {n} (mov {cfg5.n_mov}, wall {cfg5.n_wall}); "
      f"wall-static host precompute {host_s:.1f}s", flush=True)


def sync(s):
    return float(np.asarray(s.pos[0]).sum())


def arm(name, cfg, wall_static=None, reps=5):
    run = make_fastw_multi_step(params, layout, cfg, CHUNK,
                                wall_static=wall_static)
    t0 = time.time()
    s = run(state, springs, membranes)
    sync(s)
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        s = run(s, springs, membranes)
        sync(s)
    ms = (time.time() - t0) / (reps * CHUNK) * 1e3
    pps = n / ms * 1e3
    print(f"{name:44s} {ms:7.2f} ms/step  {pps / 1e6:5.2f}M p-steps/s  "
          f"(compile {comp:.0f}s)", flush=True)
    return ms, s


ms1, end1 = arm("unroll=1, in-jit walls (r5 baseline)", cfg1)
ms2, _ = arm("unroll=5, in-jit walls", cfg5)
ms3, end3 = arm("unroll=5 + wall-static hoist", cfg5, wall_static=ws)

d = float(np.max(np.abs(np.asarray(end3.pos) - np.asarray(end1.pos))))
print(f"arm3-vs-arm1 max|dpos| after {6 * CHUNK} steps: {d:.3e}",
      flush=True)
rec = dict(n=n, chunk=CHUNK, host_precompute_s=round(host_s, 1),
           baseline_ms=round(ms1, 2), unroll_ms=round(ms2, 2),
           unroll_hoist_ms=round(ms3, 2),
           psteps_per_s=round(n / ms3 * 1e3),
           dpos_vs_baseline=d)
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "r5",
        "unroll_hoist_ab.json"), "w") as f:
    json.dump(rec, f, indent=1)
print("EXIT=0", flush=True)
