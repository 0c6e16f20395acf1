"""Bisect the standalone-sort compile pathology (round 2 left it unhunted).

STATUS: closed exploration (r3). Conclusion: flat scans of the step compile super-linearly in trip count; encoded as the nested-scan workaround in core/fast.py::make_fast_multi_step. Keep for re-bisection if compile times regress.

Compiles pieces of the fast engine's sort/unsort machinery standalone and
prints wall-clock compile times. Run one piece per invocation:

    python scripts/r3_compile_bisect.py argsort|tables|inner|unsort|sweep
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene
    from sph_tpu.core import fast
    from sph_tpu.core.fast import compute_fast_config

    which = sys.argv[1]
    params = SimParams()
    scene = generate_worm_scene(params)
    n = scene.n_particles
    state0, springs, membranes = scene.device_state()
    layout = scene.layout()
    cfg = compute_fast_config(scene.pos, params, resort_every=10)
    print(f"scene: {n}; piece={which}", flush=True)

    def timed(name, fn, *args):
        t0 = time.time()
        out = jax.jit(fn).lower(*args).compile()
        print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
        return out

    if which == "argsort":
        def f(pos):
            x = pos[:, 0]
            cid = (x * 10).astype(jnp.int32)
            order = jnp.argsort(cid, stable=True).astype(jnp.int32)
            inv = jnp.zeros(n, jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32))
            return order, inv
        timed("argsort+inv", f, state0.pos)
    elif which == "tables":
        sort_ctx, carry_of, inner_step, unsort_state = fast._make_step_parts(
            params, layout, cfg)
        timed("sort_ctx", sort_ctx, state0, springs, membranes)
    elif which == "inner":
        sort_ctx, carry_of, inner_step, unsort_state = fast._make_step_parts(
            params, layout, cfg)
        ctx = jax.eval_shape(sort_ctx, state0, springs, membranes)
        ctx = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), ctx)
        carry = jax.eval_shape(
            lambda c, s: carry_of(c, s), ctx, state0)
        carry = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), carry)

        def inner(ctx, carry):
            def body(c, _):
                return inner_step(ctx, c), None
            out, _ = jax.lax.scan(body, carry, None, length=10)
            return out
        timed("inner10", inner, ctx, carry)
    elif which == "unsort":
        sort_ctx, carry_of, inner_step, unsort_state = fast._make_step_parts(
            params, layout, cfg)
        ctx = jax.eval_shape(sort_ctx, state0, springs, membranes)
        ctx = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), ctx)
        carry = jax.eval_shape(lambda c, s: carry_of(c, s), ctx, state0)
        carry = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), carry)
        timed("unsort", unsort_state, ctx, carry, state0)
    elif which == "sweep":
        # sort + 10-step scan in ONE graph, returning (ctx, carry):
        # the shape the stepper needs, fused like make_fast_multi_step
        sort_ctx, carry_of, inner_step, unsort_state = fast._make_step_parts(
            params, layout, cfg)

        def sweep(state, springs, membranes):
            ctx = sort_ctx(state, springs, membranes)
            carry = carry_of(ctx, state)

            def body(c, _):
                return inner_step(ctx, c), None
            carry, _ = jax.lax.scan(body, carry, None, length=10)
            return ctx, carry
        timed("sweep10 (sort+scan fused)", sweep, state0, springs, membranes)


if __name__ == "__main__":
    main()
