"""Quantify the fast engine's no-32-cap deviation on the dense worm
(VERDICT r2 #7): long-horizon fast-vs-exact divergence next to the exact
engine's own cap-sensitivity yardstick (32 -> 64 -> 96), plus the
boundary-shell density comparison the deviation claim is about.

Run on the real chip:  python scripts/cap_study.py [--steps 100]
Appends a results table to BASELINE.md with --record.
"""
import argparse
import dataclasses
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = ""
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--record", action="store_true")
    ap.add_argument(
        "--cached", type=int, default=0, metavar="K",
        help="use multi_step_cached with refresh_every=K as the exact "
             "engine (the practical-cost oracle: the neighbor phase — "
             "the dominant exact cost — runs once per K steps; "
             "bit-identical to multi_step at K=1)")
    args = ap.parse_args()

    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene
    from sph_tpu.core.fast import compute_fast_config, make_fast_multi_step
    from sph_tpu.core.step import multi_step, multi_step_cached, diagnostics
    from sph_tpu.constants import BOUNDARY_PARTICLE, LIQUID_PARTICLE

    params = SimParams()
    scene = generate_worm_scene(params)
    state0, springs, membranes = scene.device_state()
    layout = scene.layout()
    n = scene.n_particles
    print(f"worm: {n} particles", flush=True)

    checkpoints = list(range(args.every, args.steps + 1, args.every))

    def run_exact(cap):
        p = dataclasses.replace(params, max_neighbors=cap)
        out, s = [], state0
        t0 = time.time()
        for k in checkpoints:
            if args.cached > 0:
                s = multi_step_cached(s, springs, membranes, p, layout,
                                      args.every,
                                      refresh_every=args.cached)
            else:
                s = multi_step(s, springs, membranes, p, layout,
                               args.every)
            out.append(np.asarray(s.pos))
        tag = f" (cached K={args.cached})" if args.cached > 0 else ""
        print(f"exact cap={cap}{tag}: {args.steps} steps "
              f"({time.time()-t0:.0f}s)", flush=True)
        return out, s

    def run_fast():
        # resort_every=1: fresh windows isolate the CAP deviation from
        # the separately-quantified window staleness (BASELINE.md)
        cfg = dataclasses.replace(
            compute_fast_config(scene.pos, params), resort_every=1)
        run = make_fast_multi_step(params, layout, cfg, args.every)
        out, s = [], state0
        t0 = time.time()
        for k in checkpoints:
            s = run(s, springs, membranes)
            out.append(np.asarray(s.pos))
        print(f"fast (no cap, resort 1): {args.steps} steps "
              f"({time.time()-t0:.0f}s)", flush=True)
        return out, s

    fast_t, fast_s = run_fast()
    e32_t, e32_s = run_exact(32)
    e64_t, _ = run_exact(64)
    e96_t, _ = run_exact(96)

    rows = []
    for i, k in enumerate(checkpoints):
        d_f32 = float(np.abs(fast_t[i] - e32_t[i]).max())
        d_6432 = float(np.abs(e64_t[i] - e32_t[i]).max())
        d_9664 = float(np.abs(e96_t[i] - e64_t[i]).max())
        rows.append((k, d_f32, d_6432, d_9664))
        print(f"step {k:4d}: fast-vs-exact32 {d_f32:.2e}   "
              f"exact64-vs-32 {d_6432:.2e}   exact96-vs-64 {d_9664:.2e}",
              flush=True)

    # boundary-shell density: liquid particles within h of the wall box
    pos = np.asarray(state0.pos)
    typ = np.asarray(state0.ptype)
    liq = typ == LIQUID_PARTICLE
    h = params.h
    near_wall = (
        (pos[:, 0] < params.x_min + 2 * h) | (pos[:, 0] > params.x_max - 2 * h)
        | (pos[:, 1] < params.y_min + 2 * h)
        | (pos[:, 2] < params.z_min + 2 * h) | (pos[:, 2] > params.z_max - 2 * h)
    )
    shell = liq & near_wall
    rho_f = np.asarray(diagnostics(fast_s, params)["rho"])
    rho_e = np.asarray(diagnostics(e32_s, params)["rho"])
    line = (
        f"boundary-shell liquid density after {args.steps} steps "
        f"({int(shell.sum())} particles): fast mean "
        f"{rho_f[shell].mean():.1f} (p5 {np.percentile(rho_f[shell], 5):.1f})"
        f" vs exact32 mean {rho_e[shell].mean():.1f} "
        f"(p5 {np.percentile(rho_e[shell], 5):.1f}); rho0 {params.rho0}"
    )
    print(line, flush=True)

    if args.record:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BASELINE.md"), "a") as fh:
            fh.write(
                f"\n### No-32-cap deviation, dense worm ({n} particles, "
                f"fresh windows)\n\n"
                "| steps | fast vs exact32 | exact64 vs 32 (yardstick) | "
                "exact96 vs 64 |\n|---|---|---|---|\n")
            for k, a, b, c in rows:
                fh.write(f"| {k} | {a:.2e} | {b:.2e} | {c:.2e} |\n")
            fh.write(f"\n{line}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
