"""In-step ablation: marginal cost of each stage of the fast inner step.

STATUS: live instrument. Marginal cost per step stage; produced the r3 ablation row (BASELINE.md).

Patches _make_step_parts' params/stage wiring via SimParams and context
surgery to time step variants with stages removed; marginal = full - ablated.
"""
import os
os.environ["JAX_PLATFORMS"] = ""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
from sph_tpu.config import SimParams
from sph_tpu.scene import generate_worm_scene
from sph_tpu.core.fast import _make_step_parts, compute_fast_config

params = SimParams()
scene = generate_worm_scene(params)
state, springs, membranes = scene.device_state()
layout = scene.layout()
cfg = compute_fast_config(
    scene.pos, params,
    block=int(os.environ.get("SPH_BLOCK", "256")),
    ccol=int(os.environ.get("SPH_CCOL", "256")),
)
print(f"scene: {cfg.n_particles}", flush=True)

sort_ctx, carry_of, inner_step, _ = _make_step_parts(params, layout, cfg)
ctx = jax.jit(lambda s: sort_ctx(s, springs, membranes))(state)
carry = jax.jit(carry_of)(ctx, state)


def time_step(name, ctx_mod, params_mod=None, reps=30):
    p = params_mod or params
    _, _, step, _ = _make_step_parts(p, layout, cfg)
    f = jax.jit(lambda c, k: step(c, k))
    out = f(ctx_mod, carry)
    float(np.asarray(out[0])[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(ctx_mod, out)
    float(np.asarray(out[0])[0])
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name:40s} {ms:8.2f} ms", flush=True)
    return ms


full = time_step("full inner step", ctx)

no_el = dict(ctx)
for k in ("springs_s", "spr_static", "spr_onehot", "spr_tables"):
    no_el.pop(k, None)
m_el = full - time_step("w/o elastic", no_el)

no_mem = dict(no_el)
for k in list(no_mem):
    if k.startswith("mem_"):
        no_mem.pop(k)
m_mem = time_step("w/o elastic+membrane", no_mem)

p1 = dataclasses.replace(params, n_pcisph_iters=1)
m_iter = time_step("1 pcisph iter (w/o el+mem)", no_mem, p1)

zc = jnp.zeros_like(ctx["tables"][4])
ctx_nobnd = dict(no_mem)
ctx_nobnd["bnd_tables"] = ctx["bnd_tables"][:4] + (zc, ctx["tables"][5])
time_step("w/o el+mem, bnd pass gated off", ctx_nobnd)

ctx_noforce = dict(ctx_nobnd)
ctx_noforce["force_tables"] = ctx["force_tables"][:4] + (zc, ctx["tables"][5])
time_step("w/o el+mem+bnd, force passes off", ctx_noforce)

ctx_nothing = dict(ctx_noforce)
ctx_nothing["tables"] = ctx["tables"][:4] + (zc, ctx["tables"][5])
ctx_nothing["rho_tables"] = ctx["tables"][:4] + (zc, ctx["tables"][5])
time_step("ALL passes tile-count 0 (glue only)", ctx_nothing)
