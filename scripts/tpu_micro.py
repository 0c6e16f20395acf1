"""Micro-experiments: isolate pack-build, dot-reduction, and output-count
costs in the pair kernels on the TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(name, fn, *args, reps=20):
    import jax
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene
    from sph_tpu.core import fast
    from sph_tpu.ops import pair_kernels as pk

    block, ccol = 256, 256
    params = SimParams()
    scene = generate_worm_scene(params)
    cfg = fast.compute_fast_config(scene.pos, params, block=block, ccol=ccol)
    from sph_tpu.ops import vec3
    state, springs, membranes = scene.device_state()
    pos = vec3.split(state.pos)
    nx, ny, nz = cfg.dims

    @jax.jit
    def sorted_fields(state):
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
        tables, _, _ = fast._window_tables(pencil_s, cfg)
        xs = fast._pad_field(pos.x[order], cfg, 2000.0)
        ys = fast._pad_field(pos.y[order], cfg, 2000.0)
        zs = fast._pad_field(pos.z[order], cfg, 2000.0)
        return tables, xs, ys, zs

    tables, xs, ys, zs = sorted_fields(state)
    tables = tuple(jnp.asarray(np.asarray(t)) for t in tables)
    xs, ys, zs = (jnp.asarray(np.asarray(a)) for a in (xs, ys, zs))
    ones = jnp.ones_like(xs)

    # --- pack builds in isolation ---
    f8 = [xs, ys, zs, xs, ys, zs, ones, ones]
    timeit("pack_slab (8 rows)", jax.jit(lambda *f: fast._pack_slab(list(f))), *f8)
    timeit("pack_own (8 cols -> 128)", jax.jit(lambda *f: fast._pack_own(list(f))), *f8)

    @jax.jit
    def pack_own_nopad(*f):
        return jnp.stack(list(f), axis=1)

    timeit("pack_own no pad (8 cols)", pack_own_nopad, *f8)

    @jax.jit
    def pack_own_T(*f):
        return fast._pack_slab(list(f)).T

    timeit("pack_own via .T of slab", pack_own_T, *f8)

    main_o = fast._pack_own(f8)
    main_s = fast._pack_slab(f8)
    main_o = jnp.asarray(np.asarray(main_o))
    main_s = jnp.asarray(np.asarray(main_s))

    inv_h2 = np.float32(1.0 / params.h ** 2)
    kw = dict(block=block, ccol=ccol, n_blocks=cfg.n_blocks,
              interpret=cfg.interpret)

    # --- output-count experiment: density body with N outputs ---
    def make_nout(n_out, use_dot):
        def tile(own, slab, ctx, accs):
            q2, _, _, _ = pk._q2_of(own, slab, inv_h2)
            ok = ctx["base"] & (ctx["colg"] != ctx["own_gid"]) & (q2 <= 1.0)
            t = 1.0 - q2
            w = jnp.where(ok, t * t * t, 0.0)
            if use_dot and n_out >= 3:
                s3 = pk._wsum3(w, slab, 0)
                rest = tuple(
                    accs[k] + jnp.sum(w, axis=1, keepdims=True)
                    for k in range(3, n_out)
                )
                return tuple(accs[k] + s3[k] for k in range(3)) + rest
            return tuple(
                a + jnp.sum(w, axis=1, keepdims=True) for a in accs
            )

        return pk._make_pass(
            pk._prep_cols, tile, own_cols=pk.MAIN_COLS,
            slab_cols=pk.MAIN_COLS, n_outputs=n_out, **kw)

    for n_out in (1, 3, 6):
        p = make_nout(n_out, False)
        timeit(f"density-like, {n_out} outs, no dot",
               jax.jit(lambda t, o, s, p=p: p(t, o, s)),
               tables, main_o, main_s)
    for n_out in (3, 6):
        p = make_nout(n_out, True)
        timeit(f"density-like, {n_out} outs, 1 wsum3 dot",
               jax.jit(lambda t, o, s, p=p: p(t, o, s)),
               tables, main_o, main_s)


if __name__ == "__main__":
    main()
