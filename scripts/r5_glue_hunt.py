"""Hunt the fastw in-scan glue floor on chip (round 5, VERDICT r4 #3).

STATUS: live instrument (r5). The r5 single-dispatch ablation put the
fastw glue floor at 7.40 ms/step, but each arm there paid the ~1.5 ms
axon dispatch baseline once per step. This script times 30-step SCANS
(one dispatch) so per-step numbers reflect the shipped stepper, and
adds two lever arms the ablation could not express:

  * lax.scan ``unroll`` (amortizes per-iteration fixed cost and lets
    XLA fuse the carry re-pack of step k into the epilogue of k-1);
  * DCE arms (drift reduction, muscle wave) by overwriting the carry
    element each iteration so XLA dead-code-eliminates the producer.

Run on the chip:  python scripts/r5_glue_hunt.py
"""
import os
os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("SPH_TPU_DMA_DEPTH", "8")
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
from sph_tpu.config import SimParams
from sph_tpu.scene import generate_worm_scene
from sph_tpu.core.fastw import _make_step_parts_w, compute_fastw_config

STEPS = 30

params = SimParams()
scene = generate_worm_scene(params)
state, springs, membranes = scene.device_state()
layout = scene.layout()
cfg = compute_fastw_config(
    scene.pos, params, layout, ptype=scene.ptype,
    block=256, ccol=512, ccol_c=256,
)
print(f"scene: {layout.n_particles} (mov {cfg.n_mov}, wall {cfg.n_wall}, "
      f"shell_cap {cfg.shell_cap}); scan length {STEPS}", flush=True)

sort_ctx, carry_of, inner_step, _ = _make_step_parts_w(
    params, layout, cfg)
ctx, _diag = jax.jit(lambda s: sort_ctx(s, springs, membranes))(state)
carry = jax.jit(carry_of)(ctx, state)


def time_scan(name, ctx_mod, step=inner_step, unroll=1, reps=5,
              post=None):
    def body(c, _):
        c2 = step(ctx_mod, c)
        if post is not None:
            c2 = post(c, c2)
        return c2, None

    @jax.jit
    def run(c):
        out, _ = jax.lax.scan(body, c, None, length=STEPS, unroll=unroll)
        return out

    t0 = time.time()
    out = run(carry)
    jax.block_until_ready(out)
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = run(out)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / (reps * STEPS) * 1e3
    print(f"{name:52s} {ms:8.2f} ms/step   (compile {comp:.0f}s)",
          flush=True)
    return ms


def gate_off(tables):
    return tables[:4] + (jnp.zeros_like(tables[4]), tables[5])


# ---- baseline + unroll arms ----
full = time_scan("full step, scan unroll=1 (shipped)", ctx)
time_scan("full step, scan unroll=2", ctx, unroll=2)
time_scan("full step, scan unroll=5", ctx, unroll=5)

# ---- DCE arms on the full step ----
no_drift = time_scan(
    "full, drift reduction DCE'd", ctx,
    post=lambda c, c2: c2[:-1] + (c[-1],))
print(f"  -> drift reduction costs {full - no_drift:.2f} ms", flush=True)
no_mus = time_scan(
    "full, drift+muscle DCE'd", ctx,
    post=lambda c, c2: c2[:6] + (c[6],) + (c2[7], c[8]))
print(f"  -> muscle wave costs {no_drift - no_mus:.2f} ms", flush=True)

# ---- in-scan glue floor ----
glue_ctx = dict(ctx)
for k in ("spr_static", "spr_onehot", "spr_tables"):
    glue_ctx.pop(k, None)
for k in list(glue_ctx):
    if k.startswith("mem_"):
        glue_ctx.pop(k)
glue_ctx["tables_sm"] = gate_off(ctx["tables_sm"])
glue_ctx["tables_ms"] = gate_off(ctx["tables_ms"])
glue_ctx["tables_m"] = gate_off(ctx["tables_m"])
g = time_scan("ALL pair passes off (in-scan glue floor)", glue_ctx)
print(f"  -> in-scan glue floor {g:.2f} ms "
      f"(single-dispatch ablation said 7.40)", flush=True)
time_scan("glue floor, unroll=5", glue_ctx, unroll=5)
g_nd = time_scan(
    "glue floor, drift DCE'd", glue_ctx,
    post=lambda c, c2: c2[:-1] + (c[-1],))
print(f"  -> drift share of glue {g - g_nd:.2f} ms", flush=True)

p1 = dataclasses.replace(params, n_pcisph_iters=1)
_, _, step1, _ = _make_step_parts_w(p1, layout, cfg)
g1 = time_scan("glue floor, 1 pcisph iter", glue_ctx, step=step1)
print(f"  -> pcisph glue elementwise ~{(g - g1) / 2:.2f} ms/iter",
      flush=True)

# ---- resort cost (amortized over resort_every=30 in the bench) ----
srt = jax.jit(lambda s: sort_ctx(s, springs, membranes))
t0 = time.time()
for _ in range(5):
    out = srt(state)
jax.block_until_ready(out)
ms = (time.time() - t0) / 5 * 1e3
print(f"{'sort_ctx (per resort; /30 amortized)':52s} {ms:8.2f} ms "
      f"({ms / 30:.2f} ms/step)", flush=True)
print("EXIT=0", flush=True)
