"""Round-3: re-measure resort-period options cleanly (nothing else running).

STATUS: closed exploration (r3). Conclusion: resort_every=30 via chunked nested scans; numbers in BASELINE.md r3 table. Superseded operationally by Simulator(adaptive_resort=True) (r4).

1. make_fast_multi_step with resort_every=R, n_steps=R for R in args
   (tests the 'scan length super-linear compile' claim with a quiet host);
2. make_fast_stepper's three graphs (the standalone-sort pathology).

Run: python scripts/r3_resort.py multi 30
     python scripts/r3_resort.py stepper 30
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sync(x):
    return float(np.asarray(x).ravel()[0])


def main():
    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene
    from sph_tpu.core.fast import (
        compute_fast_config, make_fast_multi_step, make_fast_stepper,
    )

    mode = sys.argv[1]
    rs = [int(a) for a in sys.argv[2:]] or [30]
    params = SimParams()
    scene = generate_worm_scene(params)
    n = scene.n_particles
    print(f"scene: {n} particles", flush=True)
    state0, springs, membranes = scene.device_state()
    layout = scene.layout()

    for r in rs:
        cfg = compute_fast_config(scene.pos, params, resort_every=r)
        if mode == "multi":
            run = make_fast_multi_step(params, layout, cfg, r)
            t0 = time.time()
            state = run(state0, springs, membranes)
            sync(state.pos[0])
            print(f"R={r} multi: compile+warm {time.time()-t0:.1f}s",
                  flush=True)
            t0 = time.time()
            reps = 0
            while reps * r < 120 and time.time() - t0 < 30:
                state = run(state, springs, membranes)
                sync(state.pos[0])
                reps += 1
            wall = time.time() - t0
            ms = wall / (reps * r) * 1e3
            fin = bool(np.isfinite(np.asarray(state.pos)).all())
            print(f"R={r} multi: {ms:.2f} ms/step "
                  f"({n * reps * r / wall / 1e6:.2f}M psteps/s) finite={fin}",
                  flush=True)
        else:
            sort, inner, unsort = make_fast_stepper(params, layout, cfg,
                                                    inner_steps=10)
            t0 = time.time()
            ctx, carry = sort(state0, springs, membranes)
            sync(carry[0])
            print(f"stepper sort: compile+warm {time.time()-t0:.1f}s",
                  flush=True)
            t0 = time.time()
            carry = inner(ctx, carry)
            sync(carry[0])
            print(f"stepper inner: compile+warm {time.time()-t0:.1f}s",
                  flush=True)
            t0 = time.time()
            state = unsort(ctx, carry, state0)
            sync(state.pos[0])
            print(f"stepper unsort: compile+warm {time.time()-t0:.1f}s",
                  flush=True)
            # steady state at resort period r (multiples of 10)
            m = max(1, r // 10)
            t0 = time.time()
            steps = 0
            state = state0
            while steps < 120 and time.time() - t0 < 30:
                ctx, carry = sort(state, springs, membranes)
                for _ in range(m):
                    carry = inner(ctx, carry)
                state = unsort(ctx, carry, state)
                sync(state.pos[0])
                steps += m * 10
            wall = time.time() - t0
            print(f"R={m*10} stepper: {wall/steps*1e3:.2f} ms/step "
                  f"({n*steps/wall/1e6:.2f}M psteps/s)", flush=True)


if __name__ == "__main__":
    main()
