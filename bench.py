"""Headline benchmark: PCISPH particle-steps/sec on the worm scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is measured
against the BASELINE.json north-star target of 50M particle-steps/sec/chip.
Runs on whatever jax.devices() offers (the real TPU chip under the driver).
Uses the fast (Pallas pair) engine; falls back to the exact neighbor-list
engine if the fast path fails on the current backend.

PHYSICS GATE (round 3): the perf number is only printed at full value if
two compiled-on-chip correctness checks pass first — the round-2 bf16 MXU
precision disaster (silent ~5% spring-force error, worm tore apart at step
~500, invisible to every CPU/interpret test) is the regression class this
guards against:
  1. fast vs exact on a ~5k-particle box scene, 10 steps, compiled on the
     real device: max |dpos| <= 1e-4.
  2. 500 worm steps on the fast engine: finite state, max spring strain
     < 0.5, liquid density within [0.5, 2.0] x rho0.
On gate failure the metric value is multiplied by 0 so a regression can
never look like a win.
"""
import json
import sys
import time
import traceback

import numpy as np

TARGET = 50e6  # particle-steps/sec/chip north star (BASELINE.md)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def gate_box_equivalence(params):
    """Fast vs exact engines, both COMPILED on the current device.

    resort_every=1 so the pair windows are fresh every step: the exact
    engine rebuilds neighbor lists per step, so only the fresh-window
    fast path is bit-comparable — window staleness across a resort
    period is a separate, measured deviation (BASELINE.md "window
    staleness"), not what this gate hunts (compiled-precision bugs)."""
    import dataclasses

    import jax.numpy as jnp

    from sph_tpu.config import SimParams
    from sph_tpu.core.fast import compute_fast_config, make_fast_multi_step
    from sph_tpu.core.step import multi_step
    from sph_tpu.scene.scene import Scene

    h = params.h
    p = SimParams(x_max=10 * h, y_max=10 * h, z_max=10 * h,
                  cell_capacity=96)
    rng = np.random.default_rng(7)
    # 1.25x spacing keeps every particle under the exact engine's
    # 32-neighbor cap — fast (all-pairs) and exact agree only there
    r0 = p.r0 * 1.25
    ax = np.arange(14) * r0
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    pos = (2.0 + g + rng.uniform(-0.05, 0.05, g.shape) * r0).astype(
        np.float32)
    vel = rng.normal(scale=0.05, size=pos.shape).astype(np.float32)
    scene = Scene(pos=pos, vel=vel,
                  color=np.full(len(pos), 1.1, np.float32),
                  normal=np.zeros_like(pos))
    state, springs, membranes = scene.device_state()
    layout = scene.layout()
    ref = multi_step(state, springs, membranes, p, layout, 10)
    cfg = dataclasses.replace(
        compute_fast_config(scene.pos, p), resort_every=1)
    fast = make_fast_multi_step(p, layout, cfg, 10)(state, springs,
                                                    membranes)
    d = float(jnp.max(jnp.abs(fast.pos - ref.pos)))
    ok = bool(np.isfinite(d)) and d <= 1e-4
    log(f"# GATE box fast-vs-exact ({len(pos)} particles, 10 steps, "
        f"compiled): max|dpos|={d:.2e} -> {'PASS' if ok else 'FAIL'}")
    return ok


def gate_worm_integrity(scene, params, state):
    """Invariants after ~500 steps: finite, springs hold, density sane."""
    from sph_tpu.core.step import diagnostics

    pos = np.asarray(state.pos)
    ok = bool(np.isfinite(pos).all())
    lay = scene.layout()

    strain = 0.0
    if len(scene.spring_rows):
        idx = scene.spring_idx
        used = idx >= 0
        a = pos[np.repeat(scene.spring_rows, idx.shape[1])[used.ravel()]]
        b = pos[idx[used]]
        r = np.linalg.norm(a - b, axis=1) * params.simulation_scale
        rest = scene.spring_rest[used]
        strain = float(np.max(np.abs(r - rest) / np.maximum(rest, 1e-9)))
        ok = ok and strain < 0.5

    rho = np.asarray(diagnostics(state, params)["rho"])
    lq0, lq1 = lay.liquid_range if hasattr(lay, "liquid_range") else (0, 0)
    if lq1 > lq0:
        mean_rho = float(rho[lq0:lq1].mean())
    else:
        mean_rho = float(rho.mean())
    rho_ok = 0.5 * params.rho0 <= mean_rho <= 2.0 * params.rho0
    ok = ok and rho_ok
    log(f"# GATE worm integrity (step {int(state.step)}): "
        f"max strain={strain:.3f} (<0.5), mean liquid rho/rho0="
        f"{mean_rho / params.rho0:.3f} (in [0.5,2.0]) -> "
        f"{'PASS' if ok else 'FAIL'}")
    return ok


def run_engine(engine, scene, params, chunk, budget_s):
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
    while steps < 5 * chunk and time.time() - t0 < budget_s:
        state = advance(state)
        sync(state)
        steps += chunk
    wall = time.time() - t0

    # continue to ~500 steps for the integrity gate (same compiled graph)
    done = steps + chunk
    while done < 500:
        state = advance(state)
        done += chunk
    sync(state)

    return steps, wall, compile_s, state


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
        # chunk 30 = one full resort period per call (resort_every default
        # 30; the nested-scan graph compiles like the 10-step one) — the
        # resort machinery (~46 ms) amortizes 3x further than chunk 10
        steps, wall, compile_s, end_state = run_engine(
            "fast", scene, params, 30, 90.0)
    except Exception:
        traceback.print_exc(file=sys.stderr)
        log("# fast engine failed; falling back to exact")
        engine = "exact"
        steps, wall, compile_s, end_state = run_engine(
            "exact", scene, params, 5, 120.0)

    gate_ok = True
    try:
        gate_ok = gate_worm_integrity(scene, params, end_state) and gate_ok
        if engine == "fast":
            gate_ok = gate_box_equivalence(params) and gate_ok
    except Exception:
        traceback.print_exc(file=sys.stderr)
        log("# GATE crashed -> FAIL")
        gate_ok = False

    pps = n * steps / wall
    log(
        f"# worm scene ({engine} engine): {n} particles {scene.counts}; "
        f"build {build_s:.1f}s, compile+warmup {compile_s:.1f}s, "
        f"{steps} steps in {wall:.2f}s ({wall / steps * 1e3:.2f} ms/step), "
        f"device={jax.devices()[0]}"
    )
    if not gate_ok:
        log("# PHYSICS GATE FAILED — metric zeroed")
        pps = 0.0
    print(json.dumps({
        "metric": "pcisph_particle_steps_per_sec_worm",
        "value": round(pps, 1),
        "unit": "particle-steps/s/chip",
        "vs_baseline": round(pps / TARGET, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
