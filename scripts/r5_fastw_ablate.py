"""In-step ablation of the wall-compact (fastw) inner step on chip.

STATUS: live instrument (r5). Times fastw step variants with pass
groups gated off (tile counts zeroed, same graph shape) to locate the
remaining cost after the static-wall cut: moving-moving passes,
moving<-shell passes, the per-step shell rho/rho* passes (the candidate
for resort-cadence freshening), elastic, membranes, glue floor.

Run: SPH_TPU_DMA_DEPTH=8 python scripts/r5_fastw_ablate.py
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

params = SimParams()
scene = generate_worm_scene(params)
state, springs, membranes = scene.device_state()
layout = scene.layout()
cfg = compute_fastw_config(
    scene.pos, params, layout, ptype=scene.ptype,
    block=int(os.environ.get("SPH_BLOCK", "256")),
    ccol=int(os.environ.get("SPH_CCOL", "512")),
    ccol_c=int(os.environ.get("SPH_CCOL_C", "256")),
)
print(f"scene: {layout.n_particles} (mov {cfg.n_mov}, wall {cfg.n_wall}, "
      f"shell_cap {cfg.shell_cap})", flush=True)

sort_ctx, carry_of, inner_step, _ = _make_step_parts_w(params, layout, cfg)
ctx, _diag = jax.jit(lambda s: sort_ctx(s, springs, membranes))(state)
carry = jax.jit(carry_of)(ctx, state)


def time_step(name, ctx_mod, params_mod=None, reps=30):
    p = params_mod or params
    _, _, step, _ = _make_step_parts_w(p, layout, cfg)
    f = jax.jit(lambda c, k: step(c, k))
    out = f(ctx_mod, carry)
    float(np.asarray(out[0])[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(ctx_mod, out)
    float(np.asarray(out[0])[0])
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return ms


def gate_off(tables):
    return tables[:4] + (jnp.zeros_like(tables[4]), tables[5])


full = time_step("full inner step", ctx)

no_el = dict(ctx)
for k in ("spr_static", "spr_onehot", "spr_tables"):
    no_el.pop(k, None)
t = time_step("w/o elastic", no_el)
print(f"  -> elastic marginal {full - t:.2f} ms", flush=True)

no_mem = dict(no_el)
for k in list(no_mem):
    if k.startswith("mem_"):
        no_mem.pop(k)
t_nm = time_step("w/o elastic+membrane", no_mem)
print(f"  -> membrane marginal {t - t_nm:.2f} ms", flush=True)

# per-step shell rho/rho* (the resort-cadence-freshening candidate):
# gating tables_sm zeroes the 4 shell-row passes; the shell densities
# become garbage but the graph shape is unchanged
no_sm = dict(no_mem)
no_sm["tables_sm"] = gate_off(ctx["tables_sm"])
t_sm = time_step("w/o el+mem, shell rho/rho* (sm) off", no_sm)
print(f"  -> shell-density (sm) marginal {t_nm - t_sm:.2f} ms", flush=True)

# all moving<-shell coupling (density/visc/rho*/paccel/boundary ms)
no_ms = dict(no_sm)
no_ms["tables_ms"] = gate_off(ctx["tables_ms"])
t_ms = time_step("w/o el+mem+sm, moving<-shell (ms) off", no_ms)
print(f"  -> moving<-shell (ms) marginal {t_sm - t_ms:.2f} ms", flush=True)

no_mm = dict(no_ms)
no_mm["tables_m"] = gate_off(ctx["tables_m"])
t_mm = time_step("ALL pair passes off (glue floor)", no_mm)
print(f"  -> moving-moving (mm) marginal {t_ms - t_mm:.2f} ms", flush=True)
print(f"  -> glue floor {t_mm:.2f} ms", flush=True)

p1 = dataclasses.replace(params, n_pcisph_iters=1)
time_step("1 pcisph iter (w/o el+mem)", no_mem, p1)
