"""Per-pass timing of the fast engine's Pallas pair passes on the TPU.

STATUS: live instrument. Per-pass Pallas timings on the real chip (BASELINE.md r2/r3 breakdowns).
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
from sph_tpu.ops import pair_kernels as pk

block = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ccol = int(sys.argv[2]) if len(sys.argv) > 2 else 256

params = SimParams()
scene = generate_worm_scene(params)
state, springs, membranes = scene.device_state()
layout = scene.layout()
cfg = compute_fast_config(scene.pos, params, block=block, ccol=ccol)
print(f"scene: {cfg.n_particles}; block={block} ccol={ccol}", flush=True)

sort_ctx, carry_of, inner_step, unsort_state = _make_step_parts(
    params, layout, cfg)
ctx = jax.jit(lambda s: sort_ctx(s, springs, membranes))(state)
carry = jax.jit(carry_of)(ctx, state)
xs, ys, zs, vtx, vty, vtz, act, step_no = carry[:8]

isb_s = ctx["isb_s"]
vxs = jnp.where(isb_s > 0, ctx["nxs"], vtx)
vys = jnp.where(isb_s > 0, ctx["nys"], vty)
vzs = jnp.where(isb_s > 0, ctx["nzs"], vtz)
ones = jnp.ones_like(xs)

inv_h2 = np.float32(1.0 / (params.h * params.h))
kw = dict(block=cfg.block, ccol=cfg.ccol, n_blocks=cfg.n_blocks,
          inv_h2=inv_h2, interpret=cfg.interpret)
density_pass = pk.make_density_pass(c_rho=np.float32(params.c_rho), **kw)
viscsurf_pass = pk.make_viscsurf_pass(**kw)
rho_star_pass = pk.make_rho_star_pass(c_rho=np.float32(params.c_rho), **kw)
paccel_pass = pk.make_paccel_pass(
    inv_h=np.float32(1.0 / params.h),
    rho0_delta=np.float32(params.rho0 * params.delta), **kw)
boundary_pass = pk.make_boundary_pass(r0=np.float32(params.r0), **kw)


def sync(x):
    leaves = jax.tree.leaves(x)
    return float(np.asarray(leaves[0]).ravel()[0])


def timeit(name, fn, *args, reps=30):
    f = jax.jit(fn)
    out = f(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    print(f"{name:40s} {(time.time()-t0)/reps*1e3:8.2f} ms", flush=True)
    return out


main0 = jax.jit(lambda *f: fast._pack(list(f)))(
    xs, ys, zs, vxs, vys, vzs, ones, isb_s)
tables = ctx["rho_tables"]
ftables = ctx["force_tables"]
btables = ctx["bnd_tables"]

timeit("pack build (8 rows)", lambda *f: fast._pack(list(f)),
       xs, ys, zs, vxs, vys, vzs, ones, isb_s)
rho = timeit("density pass", lambda t, m: density_pass(t, m, m),
             tables, main0)
timeit("viscsurf pass (gated)", lambda t, m: viscsurf_pass(t, m, m),
       ftables, main0)
iter6 = jax.jit(lambda *f: fast._pack(list(f)))(xs, ys, zs, xs, ys, zs)
timeit("rho_star pass", lambda t, m: rho_star_pass(t, m, m),
       tables, iter6)
pa5 = jax.jit(lambda *f: fast._pack(list(f)))(xs, ys, zs, ones, ones)
timeit("paccel pass (gated)", lambda t, m: paccel_pass(t, m, m),
       ftables, pa5)
bnd = jax.jit(lambda *f: fast._pack(list(f)))(
    xs, ys, zs, ctx["nxs"], ctx["nys"], ctx["nzs"], isb_s)
timeit("boundary pass (gated)", lambda t, o, m: boundary_pass(t, o, m),
       btables, iter6, bnd)

# elastic pieces: the gather/scatter timings below date from the r2
# XLA-gather spring path; the live engine streams springs as a compact
# pair pass (ctx["spr_tables"]), so they only run when the fallback
# path is active
if springs.n_elastic and "springs_s" in ctx:
    sp = ctx["springs_s"]
    from sph_tpu.core.elastic import elastic_accel
    from sph_tpu.ops import vec3
    pos_sorted = vec3.V3(xs[:cfg.n_particles], ys[:cfg.n_particles],
                         zs[:cfg.n_particles])
    timeit("elastic_accel", lambda p, s, a: elastic_accel(s and sp or sp, sp, a, params)
           if False else elastic_accel(p, sp, a, params), pos_sorted, None, act)
    ae = jax.jit(lambda p, a: elastic_accel(p, sp, a, params))(pos_sorted, act)
    zeros = jnp.zeros(cfg.n_pad, jnp.float32)
    timeit("elastic scatter x3",
           lambda z, a: (z.at[sp.row_ids].add(a.x),
                         z.at[sp.row_ids].add(a.y),
                         z.at[sp.row_ids].add(a.z)), zeros, ae)
    idxs = sp.idx
    timeit("act gather [Ne,32]",
           lambda a, m: a[jnp.maximum(m - 1, 0)], act, sp.muscle)
    timeit("pos j-gather x3 [Ne,32]",
           lambda p, m: (p.x[m], p.y[m], p.z[m]), pos_sorted,
           jnp.maximum(idxs, 0))
