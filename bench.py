"""Headline benchmark: PCISPH particle-steps/sec on the worm scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is measured
against the BASELINE.json north-star target of 50M particle-steps/sec/chip.
Runs on whatever jax.devices() offers (the real TPU chip under the driver).
"""
import json
import sys
import time

TARGET = 50e6  # particle-steps/sec/chip north star (BASELINE.md)


def main() -> int:
    import jax

    from sph_tpu.config import SimParams
    from sph_tpu.core.step import multi_step
    from sph_tpu.scene import generate_worm_scene

    # Full-size worm-in-pool world (owPhysicsConstant.h box: 30h x 20h x 250h)
    params = SimParams()
    t0 = time.time()
    scene = generate_worm_scene(params)
    build_s = time.time() - t0
    state, springs, membranes = scene.device_state()
    layout = scene.layout()
    n = scene.n_particles

    chunk = 50
    # warmup + compile
    t0 = time.time()
    state = multi_step(state, springs, membranes, params, layout, chunk)
    jax.block_until_ready(state.pos)
    compile_s = time.time() - t0

    # timed run
    steps = 0
    t0 = time.time()
    while steps < 200 and time.time() - t0 < 120.0:
        state = multi_step(state, springs, membranes, params, layout, chunk)
        jax.block_until_ready(state.pos)
        steps += chunk
    wall = time.time() - t0

    pps = n * steps / wall
    print(
        f"# worm scene: {n} particles {scene.counts}; "
        f"build {build_s:.1f}s, compile+warmup {compile_s:.1f}s, "
        f"{steps} steps in {wall:.2f}s "
        f"({wall / steps * 1e3:.2f} ms/step), device={jax.devices()[0]}",
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
