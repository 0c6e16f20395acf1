"""Headline benchmark: PCISPH particle-steps/sec on the worm scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is measured
against the BASELINE.json north-star target of 50M particle-steps/sec/chip.
Runs on whatever jax.devices() offers (the real TPU chip under the driver).
Uses the fast (Pallas pair) engine; falls back to the exact neighbor-list
engine if the fast path fails on the current backend.
"""
import json
import sys
import time
import traceback

import numpy as np

TARGET = 50e6  # particle-steps/sec/chip north star (BASELINE.md)


def run_engine(engine, scene, params, chunk, budget_s):
    import jax

    from sph_tpu.core.step import multi_step
    from sph_tpu.core.fast import compute_fast_config, make_fast_multi_step

    state, springs, membranes = scene.device_state()
    layout = scene.layout()
    if engine == "fast":
        cfg = compute_fast_config(scene.pos, params)
        run = make_fast_multi_step(params, layout, cfg, chunk)

        def advance(s):
            return run(s, springs, membranes)
    else:
        def advance(s):
            return multi_step(s, springs, membranes, params, layout, chunk)

    def sync(s):
        # the experimental axon PJRT plugin's block_until_ready does not
        # actually block; a host materialization does
        return float(np.asarray(s.pos[0]).sum())

    t0 = time.time()
    state = advance(state)
    sync(state)
    compile_s = time.time() - t0

    steps = 0
    t0 = time.time()
    while steps < 10 * chunk and time.time() - t0 < budget_s:
        state = advance(state)
        sync(state)
        steps += chunk
    wall = time.time() - t0

    # the fast engine streams exact interaction windows (no capacities, so
    # no truncation to check); the exact engine's cell capacity is measured
    # scene-side by the Simulator
    return steps, wall, compile_s


def main() -> int:
    import jax

    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene

    # Full-size worm-in-pool world (owPhysicsConstant.h box: 30h x 20h x 250h)
    params = SimParams()
    t0 = time.time()
    scene = generate_worm_scene(params)
    build_s = time.time() - t0
    n = scene.n_particles

    engine = "fast"
    try:
        steps, wall, compile_s = run_engine("fast", scene, params, 10, 90.0)
    except Exception:
        traceback.print_exc(file=sys.stderr)
        print("# fast engine failed; falling back to exact", file=sys.stderr)
        engine = "exact"
        steps, wall, compile_s = run_engine("exact", scene, params, 5, 120.0)

    pps = n * steps / wall
    print(
        f"# worm scene ({engine} engine): {n} particles {scene.counts}; "
        f"build {build_s:.1f}s, compile+warmup {compile_s:.1f}s, "
        f"{steps} steps in {wall:.2f}s ({wall / steps * 1e3:.2f} ms/step), "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "pcisph_particle_steps_per_sec_worm",
        "value": round(pps, 1),
        "unit": "particle-steps/s/chip",
        "vs_baseline": round(pps / TARGET, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
