"""Quantify the fast engine's no-32-cap deviation on the dense worm
(VERDICT r2 #7): long-horizon fast-vs-exact divergence next to the exact
engine's own cap-sensitivity yardstick (32 -> 64 -> 96), plus the
boundary-shell density comparison the deviation claim is about.

STATUS: live instrument (r4). Crash-resilient layout: each arm (fast,
exact cap=32/64/96) runs in its OWN subprocess and checkpoints its
trajectory to results/r4/cap_arms/<arm>.npz — a TPU-worker crash in one
arm (observed repeatedly for cap=64 after two prior arms compiled in the
same process: cumulative HBM pressure) neither loses completed arms nor
blocks the table; reruns resume from the saved npz files. Arms that
never complete are reported as unavailable columns.

Run on the real chip:  python scripts/cap_study.py [--steps 100]
Appends a results table to BASELINE.md with --record.
"""
import argparse
import dataclasses
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

ARM_DIR = os.path.join(ROOT, "results", "r4", "cap_arms")
# e32p: exact cap=32 from a 1e-6-perturbed start — the chaos yardstick
# (how fast ANY perturbation grows under the exact engine), needed
# because the cap=64/96 arms kernel-fault the axon plugin (BASELINE.md)
ARMS = ("fast", "e32", "e32p", "e64", "e96")


def run_arm(arm, args):
    """Run one arm to completion and save its checkpoints (subprocess)."""
    import jax.numpy as jnp

    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene
    from sph_tpu.core.fast import compute_fast_config, make_fast_multi_step
    from sph_tpu.core.step import (
        multi_step, multi_step_cached, multi_step_unrolled_cached,
        diagnostics)

    params = SimParams()
    scene = generate_worm_scene(params)
    state0, springs, membranes = scene.device_state()
    layout = scene.layout()
    print(f"[{arm}] worm: {scene.n_particles} particles", flush=True)

    checkpoints = list(range(args.every, args.steps + 1, args.every))
    t0 = time.time()
    out, s = [], state0
    partial = os.path.join(ARM_DIR, f"{arm}.partial.npz")
    sched = np.asarray([args.steps, args.every, args.cached,
                        int(args.unroll)])

    def save_partial():
        # chunk-level crash resilience: a TPU-worker fault mid-arm (the
        # observed axon cap=64 failure mode) keeps every completed chunk;
        # the orchestrator's table truncates columns to the common
        # checkpoint count, so a partial arm still yields yardstick rows.
        # Written atomically (ADVICE r4: a crash mid-write must not leave
        # a truncated npz that poisons the rerun); vel/step/sched ride
        # along so a rerun can TRULY resume from the last chunk.
        tmp = partial + ".tmp.npz"  # savez appends .npz to other names
        np.savez_compressed(
            tmp, traj=np.stack(out),
            checkpoints=np.asarray(checkpoints[:len(out)]),
            vel=np.asarray(s.vel), act=np.asarray(s.muscle_activation),
            step=np.asarray(s.step), sched=sched)
        os.replace(tmp, partial)

    if os.path.exists(partial):
        # resume from the partial iff it matches this run's schedule and
        # carries full state (ADVICE r4: a stale partial from an older
        # cadence silently misaligns the yardstick rows)
        try:
            z = np.load(partial)
            ok = ("sched" in z.files and "vel" in z.files
                  and np.array_equal(z["sched"], sched)
                  and np.array_equal(
                      z["checkpoints"],
                      np.asarray(checkpoints[: len(z["checkpoints"])])))
        except Exception as e:  # truncated/corrupt partial
            print(f"[{arm}] unreadable partial discarded: {e}", flush=True)
            ok = False
        if ok:
            out = list(z["traj"])
            s = dataclasses.replace(
                state0,
                pos=jnp.asarray(z["traj"][-1], jnp.float32),
                vel=jnp.asarray(z["vel"], jnp.float32),
                muscle_activation=jnp.asarray(z["act"], jnp.float32),
                step=jnp.asarray(z["step"], jnp.int32))
            print(f"[{arm}] resumed at {len(out)} chunks "
                  f"({len(checkpoints) - len(out)} to go)", flush=True)
        else:
            os.remove(partial)
    todo = checkpoints[len(out):]

    if arm == "fast":
        # resort_every=1: fresh windows isolate the CAP deviation from
        # the separately-quantified window staleness (BASELINE.md)
        cfg = dataclasses.replace(
            compute_fast_config(scene.pos, params), resort_every=1)
        run = make_fast_multi_step(params, layout, cfg, args.every)
        for _ in todo:
            s = run(s, springs, membranes)
            out.append(np.asarray(s.pos))
            save_partial()
    else:
        cap = int(arm[1:].rstrip("p"))
        p = dataclasses.replace(params, max_neighbors=cap)
        if arm.endswith("p") and not out:
            # one particle, one axis, exactly one f32 ulp (an additive
            # 1e-6 is BELOW f32 resolution at |pos|~20 and rounds away —
            # measured: the first attempt diverged 0.00 at every step)
            pos = np.asarray(s.pos).copy()
            pos[0, 0] = np.nextafter(pos[0, 0], np.float32(np.inf),
                                     dtype=np.float32)
            s = dataclasses.replace(s, pos=jnp.asarray(pos, jnp.float32))
        for _ in todo:
            if args.unroll and args.cached > 0:
                # axon scan-fault workaround at practical cost: cached
                # neighbor indices (refresh every K) + one dispatch per
                # step — no lax.scan anywhere, and the SAME K cadence as
                # the cached e32 arm (apples-to-apples yardstick)
                s = multi_step_unrolled_cached(
                    s, springs, membranes, p, layout, args.every,
                    refresh_every=args.cached)
            elif args.unroll:
                # axon-plugin workaround (BASELINE.md r4): the SCANNED
                # cap=64 worm step kernel-faults the TPU worker while the
                # identical graph dispatched step-by-step runs fine
                # (bisect: neighbors-only OK, 1 step OK, scan-of-10
                # faults, loop-of-10 OK) — pay per-dispatch overhead to
                # get the yardstick at all
                for _ in range(args.every):
                    s = multi_step(s, springs, membranes, p, layout, 1)
            elif args.cached > 0:
                s = multi_step_cached(s, springs, membranes, p, layout,
                                      args.every,
                                      refresh_every=args.cached)
            else:
                s = multi_step(s, springs, membranes, p, layout, args.every)
            out.append(np.asarray(s.pos))
            save_partial()

    rho = np.asarray(diagnostics(s, params)["rho"])
    np.savez_compressed(
        os.path.join(ARM_DIR, f"{arm}.npz"),
        traj=np.stack(out), rho=rho, checkpoints=np.asarray(checkpoints))
    if os.path.exists(partial):
        os.remove(partial)
    print(f"[{arm}] {args.steps} steps done ({time.time()-t0:.0f}s)",
          flush=True)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--arm", choices=ARMS, default=None,
                    help="internal: run a single arm and exit")
    ap.add_argument("--arms", default=",".join(ARMS),
                    help="comma list of arms the orchestrator attempts "
                         "(cached npz arms always enter the table); use "
                         "to skip the axon-faulting e64/e96 arms")
    ap.add_argument("--unroll", action="store_true",
                    help="exact arms: dispatch one step per jit call "
                         "instead of lax.scan (axon cap=64 scan-fault "
                         "workaround; slower, same results)")
    ap.add_argument(
        "--cached", type=int, default=0, metavar="K",
        help="use multi_step_cached with refresh_every=K as the exact "
             "engine (the practical-cost oracle: the neighbor phase — "
             "the dominant exact cost — runs once per K steps; "
             "bit-identical to multi_step at K=1)")
    args = ap.parse_args()
    os.makedirs(ARM_DIR, exist_ok=True)

    if args.arm:
        return run_arm(args.arm, args)

    # Orchestrator: one subprocess per missing arm; crashes are tolerated.
    attempt = [a.strip() for a in args.arms.split(",") if a.strip()]
    for arm in attempt:
        path = os.path.join(ARM_DIR, f"{arm}.npz")
        if os.path.exists(path):
            print(f"{arm}: cached -> {path}", flush=True)
            continue
        argv = [sys.executable, os.path.abspath(__file__), "--arm", arm,
                "--steps", str(args.steps), "--every", str(args.every),
                "--cached", str(args.cached)]
        if args.unroll:
            argv.append("--unroll")
        r = subprocess.run(argv, cwd=ROOT,
                           timeout=10800 if args.unroll else 2700)
        if r.returncode != 0:
            print(f"{arm}: FAILED rc={r.returncode} (arm skipped; rerun "
                  "resumes completed arms)", flush=True)

    arms, partial_arms = {}, []
    sched = np.asarray([args.steps, args.every, args.cached,
                        int(args.unroll)])
    for arm in ARMS:
        # final npz preferred; a .partial.npz from a crashed arm still
        # contributes its completed-chunk rows to the table — but only
        # if it matches this run's schedule (ADVICE r4: a stale partial
        # from an older cadence silently misaligns rows) and is readable
        # (ADVICE r4: a crash mid-write must not kill the whole table)
        for suffix in (".npz", ".partial.npz"):
            path = os.path.join(ARM_DIR, f"{arm}{suffix}")
            if not os.path.exists(path):
                continue
            try:
                z = np.load(path)
                z["traj"].shape  # force header read
            except Exception as e:
                print(f"{arm}: unreadable {suffix} skipped: {e}",
                      flush=True)
                continue
            if suffix == ".partial.npz":
                if "sched" not in z.files or not np.array_equal(
                        z["sched"], sched):
                    print(f"{arm}: stale partial (schedule mismatch) "
                          "skipped", flush=True)
                    continue
                partial_arms.append(
                    f"{arm} ({len(z['checkpoints'])}/"
                    f"{args.steps // args.every} checkpoints)")
            arms[arm] = z
            break
    if "fast" not in arms or "e32" not in arms:
        print("cap_study: core arms (fast, e32) unavailable — no table")
        return 1

    checkpoints = arms["e32"]["checkpoints"]

    def col(a, b):
        if a not in arms or b not in arms:
            return None
        ta, tb = arms[a]["traj"], arms[b]["traj"]
        k = min(len(ta), len(tb))
        # rows are aligned by index: the overlapping checkpoint
        # schedules must agree exactly (ADVICE r4)
        assert np.array_equal(arms[a]["checkpoints"][:k],
                              arms[b]["checkpoints"][:k]), (a, b)
        return np.abs(ta[:k] - tb[:k]).max(axis=(1, 2))

    cols = [("fast vs exact32", col("fast", "e32")),
            ("exact32 one-ulp-perturbed vs exact32 (chaos yardstick)",
             col("e32p", "e32")),
            ("exact64 vs 32 (yardstick)", col("e64", "e32")),
            # the convergence test: fast integrates ALL pairs within h at
            # fresh cadence-1 windows; exact64 raises the cap. If this
            # column sits BELOW fast-vs-exact32, raising the cap moves
            # the reference-semantics engine TOWARD the uncapped model —
            # i.e. the fast-vs-exact32 gap is the reference's own
            # truncation error, not ours. CAVEAT (ADVICE r4): with
            # --cached K>1 the exact arms refresh neighbor INDICES every
            # K steps while fast runs fresh windows, so this column
            # confounds cap effects with index staleness; a strict
            # convergence reading needs --cached 1 (or no --cached).
            ("fast vs exact64 (convergence)", col("fast", "e64")),
            ("exact96 vs 64", col("e96", "e64"))]
    header = "| steps | " + " | ".join(n for n, _ in cols) + " |"
    sep = "|---" * (len(cols) + 1) + "|"
    rows = []
    for i, k in enumerate(checkpoints):
        cells = [f"{c[i]:.2e}" if c is not None and i < len(c) else "n/a"
                 for _, c in cols]
        rows.append(f"| {int(k)} | " + " | ".join(cells) + " |")
        print(rows[-1], flush=True)

    # boundary-shell density: liquid particles within 2h of the wall box
    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene
    from sph_tpu.constants import LIQUID_PARTICLE

    params = SimParams()
    scene = generate_worm_scene(params)
    pos = np.asarray(scene.pos)
    typ = np.asarray(scene.ptype)
    h = params.h
    near_wall = (
        (pos[:, 0] < params.x_min + 2 * h) | (pos[:, 0] > params.x_max - 2 * h)
        | (pos[:, 1] < params.y_min + 2 * h)
        | (pos[:, 2] < params.z_min + 2 * h) | (pos[:, 2] > params.z_max - 2 * h)
    )
    shell = (typ == LIQUID_PARTICLE) & near_wall
    if "rho" in arms["fast"].files and "rho" in arms["e32"].files:
        rho_f, rho_e = arms["fast"]["rho"], arms["e32"]["rho"]
        line = (
            f"boundary-shell liquid density after {args.steps} steps "
            f"({int(shell.sum())} particles): fast mean "
            f"{rho_f[shell].mean():.1f} "
            f"(p5 {np.percentile(rho_f[shell], 5):.1f})"
            f" vs exact32 mean {rho_e[shell].mean():.1f} "
            f"(p5 {np.percentile(rho_e[shell], 5):.1f}); rho0 {params.rho0}"
        )
    else:
        line = ("boundary-shell density: skipped (an arm is partial — "
                "final-state rho unavailable)")
    print(line, flush=True)

    if args.record:
        tag = (f"cached K={args.cached}" if args.cached else "multi_step")
        missing = [a for a in ARMS if a not in arms]
        note = (f" (arms unavailable after subprocess crash: "
                f"{', '.join(missing)})" if missing else "")
        if partial_arms:
            # ADVICE r4: a truncated column must not read as a completed
            # run in the recorded table
            note += f" (partial arms: {', '.join(partial_arms)})"
        with open(os.path.join(ROOT, "BASELINE.md"), "a") as fh:
            fh.write(
                f"\n### No-32-cap deviation, dense worm "
                f"({scene.n_particles} particles, fresh windows, exact = "
                f"{tag}){note}\n\n" + header + "\n" + sep + "\n")
            for r_ in rows:
                fh.write(r_ + "\n")
            fh.write(f"\n{line}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
