"""TPU component profile: time the fast step's pieces in isolation.

STATUS: live instrument. Step-component timing on the real chip; produced the r3 in-step ablation (BASELINE.md).

Run: python scripts/tpu_profile.py [block ccol]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(name, fn, *args, reps=20):
    import jax

    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x).ravel()[:1], out
    )  # sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name:36s} {ms:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene
    from sph_tpu.core import fast
    from sph_tpu.ops import pair_kernels as pk
    from sph_tpu.ops import vec3

    block = int(sys.argv[1]) if len(sys.argv) > 2 else 256
    ccol = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    params = SimParams()
    scene = generate_worm_scene(params)
    n = scene.n_particles
    print(f"scene: {n} particles; block={block} ccol={ccol}", flush=True)
    state, springs, membranes = scene.device_state()
    layout = scene.layout()
    cfg = fast.compute_fast_config(scene.pos, params, block=block, ccol=ccol)

    nx, ny, nz = cfg.dims
    far = np.float32(params.x_max + 100 * params.h)

    @jax.jit
    def sort_and_tables(state):
        pos = vec3.split(state.pos)
        cell = jnp.float32(1.0 / params.h)
        bx, by, bz = (jnp.float32(b) for b in params.box_min)
        cx = jnp.clip(((pos.x - bx) * cell).astype(jnp.int32), 0, nx - 1)
        cy = jnp.clip(((pos.y - by) * cell).astype(jnp.int32), 0, ny - 1)
        cz = jnp.clip(((pos.z - bz) * cell).astype(jnp.int32), 0, nz - 1)
        pencil = cx + nx * cz
        cid = cy + ny * pencil
        order = jnp.argsort(cid, stable=True).astype(jnp.int32)
        pencil_s = pencil[order]
        tables, pstart, pranges, _gt = fast._window_tables(pencil_s, cfg)
        xs = fast._pad_field(pos.x[order], cfg, far)
        ys = fast._pad_field(pos.y[order], cfg, far)
        zs = fast._pad_field(pos.z[order], cfg, far)
        return tables, xs, ys, zs, order

    tables, xs, ys, zs, order = timeit("sort+tables+3 reorders",
                                       sort_and_tables, state)
    tables = jax.tree_util.tree_map(np.asarray, tables)
    cnt = tables[4]
    print(f"  tiles/block avg={cnt.mean():.2f} max={cnt.max()} "
          f"pairs/particle={cnt.mean() * ccol:.0f}", flush=True)
    tables = tuple(jnp.asarray(t) for t in tables)

    kw = dict(block=cfg.block, ccol=cfg.ccol, n_blocks=cfg.n_blocks,
              inv_h2=np.float32(1.0 / params.h ** 2),
              interpret=cfg.interpret)
    density = pk.make_density_pass(c_rho=np.float32(params.c_rho), **kw)
    viscsurf = pk.make_viscsurf_pass(**kw)
    paccel = pk.make_paccel_pass(
        inv_h=np.float32(1 / params.h),
        rho0_delta=np.float32(params.rho0 * params.delta), **kw)

    ones = jnp.ones_like(xs)

    @jax.jit
    def packs(xs, ys, zs):
        return fast._pack([xs, ys, zs, ones, ones, ones, ones, ones])

    main_s = timeit("build main pack", packs, xs, ys, zs)

    d_jit = jax.jit(lambda t, s: density(t, s, s))
    timeit("density pass", d_jit, tables, main_s)
    v_jit = jax.jit(lambda t, s: viscsurf(t, s, s))
    timeit("viscsurf pass (6 outs)", v_jit, tables, main_s)

    @jax.jit
    def pa(t, xs, ys, zs):
        f = fast._pack([xs, ys, zs, ones, ones])
        return paccel(t, f, f)

    timeit("paccel pass (+pack)", pa, tables, xs, ys, zs)

    # elastic + membrane glue
    from sph_tpu.core.elastic import elastic_accel
    from sph_tpu.models import muscle

    @jax.jit
    def elast(state):
        pos = vec3.split(state.pos)
        act = state.muscle_activation
        return elastic_accel(pos, springs, act, params)

    timeit("elastic_accel (XLA gather)", elast, state)

    # full step for reference
    run = fast.make_fast_multi_step(params, layout, cfg, 10)
    t0 = time.time()
    out = run(state, springs, membranes)
    np.asarray(out.pos[0])
    print(f"full 10-step compile: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out = run(out, springs, membranes)
    np.asarray(out.pos[0])
    ms = (time.time() - t0) / 10 * 1e3
    print(f"{'full step (in 10-scan)':36s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
