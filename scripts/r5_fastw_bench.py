"""On-chip A/B: wall-compact (fastw) engine vs the r4 fast engine.

STATUS: live instrument (r5). The static-wall lever (VERDICT r4 #1)
measured end-to-end on the real worm: 44% of the scene is frozen wall
(`/root/reference/src/owHelper.cpp:775-928`, `sphFluid.cl:616-622`);
fastw keeps only moving rows in the hot carry and streams walls as a
compact static slab + thin live shell (core/fastw.py). This script
answers, on the chip the r4 plateau was measured on:

  1. ms/step + particle-steps/s for fast vs fastw at the tuned config
     (results/r4/best_config.json), resort_every=30, chunk=30;
  2. a 10-step fresh-window precision A/B (fast vs fastw, the only
     difference is f32 reassociation across the split column passes);
  3. overflow diagnostics (shell/tile) stay 0 at worm scale;
  4. worm-integrity invariants on the fastw end state (finite, strain,
     liquid density) after ~500 steps.

Writes results/r5/fastw_bench.json and prints the table.

Run: python scripts/r5_fastw_bench.py [reps]
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "results", "r5")


def sync(s):
    # the experimental axon plugin's block_until_ready does not block;
    # a host materialization does
    return float(np.asarray(s.pos[0]).sum())


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    os.makedirs(OUT, exist_ok=True)
    import jax

    from sph_tpu.config import SimParams
    from sph_tpu.core.fast import compute_fast_config, make_fast_multi_step
    from sph_tpu.core.fastw import (
        compute_fastw_config,
        make_fastw_multi_step,
    )
    from sph_tpu.scene import generate_worm_scene

    tuned = {}
    tpath = os.path.join(ROOT, "results", "r4", "best_config.json")
    if os.path.exists(tpath):
        tuned = json.load(open(tpath))
    block = int(tuned.get("block", 256))
    ccol = int(tuned.get("ccol", 512))
    ccol_c = tuned.get("ccol_c")
    ccol_c = int(ccol_c) if ccol_c else None
    if "depth" in tuned and "SPH_TPU_DMA_DEPTH" not in os.environ:
        os.environ["SPH_TPU_DMA_DEPTH"] = str(int(tuned["depth"]))

    params = SimParams()
    t0 = time.time()
    scene = generate_worm_scene(params)
    n = scene.n_particles
    print(f"scene: {n} particles {scene.counts}, build {time.time()-t0:.1f}s, "
          f"device={jax.devices()[0]}", flush=True)
    state0, springs, membranes = scene.device_state()
    layout = scene.layout()

    rec = {"n": n, "block": block, "ccol": ccol, "ccol_c": ccol_c,
           "depth": os.environ.get("SPH_TPU_DMA_DEPTH")}

    # --- throughput arms ---------------------------------------------
    chunk = 30

    def time_arm(name, build):
        run = build()
        t0 = time.time()
        state = run(state0)
        sync(state)
        compile_s = time.time() - t0
        t0 = time.time()
        done = 0
        while done < reps and time.time() - t0 < 120:
            state = run(state)
            sync(state)
            done += 1
        wall = time.time() - t0
        ms = wall / (done * chunk) * 1e3
        pps = n * done * chunk / wall
        fin = bool(np.isfinite(np.asarray(state.pos)).all())
        print(f"{name}: compile {compile_s:.1f}s, {ms:.2f} ms/step, "
              f"{pps/1e6:.2f}M psteps/s, finite={fin} "
              f"({done}x{chunk} steps)", flush=True)
        rec[name] = {"ms_per_step": ms, "psteps_per_s": pps,
                     "compile_s": compile_s, "finite": fin}
        return state

    def build_fast():
        cfg = compute_fast_config(scene.pos, params, block=block, ccol=ccol,
                                  ccol_c=ccol_c, resort_every=30)
        run = make_fast_multi_step(params, layout, cfg, chunk)
        return lambda s: run(s, springs, membranes)

    fastw_diag = {}

    def build_fastw():
        cfg = compute_fastw_config(scene.pos, params, layout,
                                   ptype=scene.ptype, block=block,
                                   ccol=ccol, ccol_c=ccol_c,
                                   resort_every=30)
        print(f"fastw cfg: n_mov={cfg.n_mov} n_wall={cfg.n_wall} "
              f"shell_cap={cfg.shell_cap} blocks={cfg.n_blocks}"
              f"+{cfg.n_blocks_s}s", flush=True)
        rec["fastw_cfg"] = {"n_mov": cfg.n_mov, "n_wall": cfg.n_wall,
                            "shell_cap": cfg.shell_cap}
        run = make_fastw_multi_step(params, layout, cfg, chunk,
                                    return_diag=True)

        def call(s):
            out, diag = run(s, springs, membranes)
            fastw_diag["shell_overflow"] = diag["shell_overflow"]
            fastw_diag["tile_overflow"] = diag["tile_overflow"]
            return out

        return call

    end_f = time_arm("fast", build_fast)
    end_w = time_arm("fastw", build_fastw)
    # snapshot as plain ints: the integrity continuation below re-invokes
    # the fastw run and would mutate the live diag dict back to arrays
    ovf = {k: int(np.asarray(v)) for k, v in fastw_diag.items()}
    print(f"fastw overflow: {ovf}", flush=True)
    rec["fastw_overflow"] = ovf

    # --- precision A/B: 10 steps, fresh windows ----------------------
    cfg_f1 = dataclasses.replace(
        compute_fast_config(scene.pos, params, block=block, ccol=ccol,
                            ccol_c=ccol_c), resort_every=1)
    cfg_w1 = dataclasses.replace(
        compute_fastw_config(scene.pos, params, layout, ptype=scene.ptype,
                             block=block, ccol=ccol, ccol_c=ccol_c),
        resort_every=1)
    a = make_fast_multi_step(params, layout, cfg_f1, 10)(
        state0, springs, membranes)
    b = make_fastw_multi_step(params, layout, cfg_w1, 10)(
        state0, springs, membranes)
    d = float(np.abs(np.asarray(a.pos) - np.asarray(b.pos)).max())
    print(f"precision A/B (10 steps, fresh windows): max|dpos|={d:.2e}",
          flush=True)
    rec["ab_10step_max_dpos"] = d

    # --- integrity on the fastw end state (~500 steps total) ---------
    from bench import gate_worm_integrity

    state = end_w
    run = build_fastw()
    t0 = time.time()
    while int(np.asarray(state.step)) < 500 and time.time() - t0 < 300:
        state = run(state)
    sync(state)
    ok = gate_worm_integrity(scene, params, state)
    rec["integrity_pass"] = bool(ok)
    rec["integrity_step"] = int(np.asarray(state.step))

    sp = rec.get("fastw", {}).get("psteps_per_s", 0.0)
    sf = rec.get("fast", {}).get("psteps_per_s", 1.0)
    rec["speedup"] = sp / sf if sf else None
    print(f"SPEEDUP fastw/fast = {rec['speedup']:.3f}", flush=True)
    with open(os.path.join(OUT, "fastw_bench.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote results/r5/fastw_bench.json", flush=True)


if __name__ == "__main__":
    main()
