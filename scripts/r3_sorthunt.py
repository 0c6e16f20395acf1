"""Pin down where the stepper-sort 445s goes: compile or first execution,

STATUS: closed exploration (r3). Conclusion: the 445 s stepper-sort cost was compile, not execution; folded into the nested-scan note in core/fast.py.
sort_ctx alone or +carry_of.

Run: python scripts/r3_sorthunt.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene
    from sph_tpu.core import fast
    from sph_tpu.core.fast import compute_fast_config

    params = SimParams()
    scene = generate_worm_scene(params)
    state0, springs, membranes = scene.device_state()
    layout = scene.layout()
    cfg = compute_fast_config(scene.pos, params)
    sort_ctx, carry_of, inner_step, unsort_state = fast._make_step_parts(
        params, layout, cfg)

    def sort(state, springs, membranes):
        ctx = sort_ctx(state, springs, membranes)
        return ctx, carry_of(ctx, state)

    t0 = time.time()
    c1 = jax.jit(sort).lower(state0, springs, membranes).compile()
    print(f"sort (ctx+carry) lower+compile: {time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    out = c1(state0, springs, membranes)
    print(f"  trace-free first call dispatched: {time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    v = float(np.asarray(out[1][0]).ravel()[0])
    print(f"  materialize: {time.time()-t0:.1f}s (v={v:.3f})", flush=True)
    t0 = time.time()
    out = c1(state0, springs, membranes)
    float(np.asarray(out[1][0]).ravel()[0])
    print(f"  second call+mat: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
