"""Component timing of the sorted-space fast step on the real TPU.

STATUS: closed exploration (r3 variant of tpu_profile.py with sorted-space isolation); results folded into BASELINE.md r3 ablation.
"""
import os
os.environ["JAX_PLATFORMS"] = ""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sph_tpu.config import SimParams
from sph_tpu.scene import generate_worm_scene
from sph_tpu.core import fast
from sph_tpu.core.fast import _make_step_parts, compute_fast_config

params = SimParams()
scene = generate_worm_scene(params)
state, springs, membranes = scene.device_state()
layout = scene.layout()
cfg = compute_fast_config(scene.pos, params)
print(f"scene: {cfg.n_particles} particles; block={cfg.block} "
      f"ccol={cfg.ccol} R={cfg.resort_every}", flush=True)

sort_ctx, carry_of, inner_step, unsort_state = _make_step_parts(
    params, layout, cfg)


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timeit(name, fn, *args, reps=20):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name:38s} {ms:8.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return out


# stage 1: sort context + carry
f_sort = jax.jit(lambda s: sort_ctx(s, springs, membranes))
ctx = timeit("sort_ctx (per resort)", f_sort, state)
f_carry = jax.jit(carry_of)
carry = timeit("carry_of (per resort)", f_carry, ctx, state)

# stage 2: one inner step
f_step = jax.jit(inner_step)
carry2 = timeit("inner_step (per step)", f_step, ctx, carry)

# stage 3: inner step WITHOUT elastic (springs ablation)
ctx_noel = dict(ctx)
ctx_noel.pop("springs_s", None)
carry3 = timeit("inner_step w/o elastic", f_step, ctx_noel, carry)

# stage 4: w/o membranes either
ctx_nomem = dict(ctx_noel)
for k in list(ctx_nomem):
    if k.startswith("mem_"):
        ctx_nomem.pop(k)
carry4 = timeit("inner_step w/o elastic+membrane", f_step, ctx_nomem, carry)

f_unsort = jax.jit(unsort_state)
timeit("unsort_state (per resort)", f_unsort, ctx, carry2, state)

# full 10-step sweep for reference
run = fast.make_fast_multi_step(params, layout, cfg, 10)
t0 = time.time()
out = run(state, springs, membranes)
sync(out.pos)
print(f"full 10-step compile: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(3):
    out = run(out, springs, membranes)
sync(out.pos)
print(f"full step (in 10-scan)             {(time.time()-t0)/30*1e3:8.2f} ms",
      flush=True)
