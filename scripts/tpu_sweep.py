"""TPU micro-bench: sweep fast-engine (block, ccol) on the worm scene.

STATUS: live instrument. (block, ccol) sweep on the worm; last recorded r2 (BASELINE.md).

Run: python scripts/tpu_sweep.py [block ccol [steps]]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_worm_scene
    from sph_tpu.core.fast import compute_fast_config, make_fast_multi_step

    params = SimParams()
    t0 = time.time()
    scene = generate_worm_scene(params)
    print(f"scene: {scene.n_particles} particles, build {time.time()-t0:.1f}s",
          flush=True)
    n = scene.n_particles
    state0, springs, membranes = scene.device_state()
    layout = scene.layout()

    configs = [(256, 256, 10), (128, 128, 10), (128, 256, 10),
               (256, 128, 10), (256, 256, 20), (512, 256, 10)]
    if len(sys.argv) >= 3:
        configs = [(int(sys.argv[1]), int(sys.argv[2]),
                    int(sys.argv[4]) if len(sys.argv) >= 5 else 10)]
    chunk = int(sys.argv[3]) if len(sys.argv) >= 4 else 10

    def sync(s):
        return float(np.asarray(s.pos[0]).sum())

    for block, ccol, r_every in configs:
        cfg = compute_fast_config(scene.pos, params, block=block, ccol=ccol,
                                  resort_every=r_every)
        run = make_fast_multi_step(params, layout, cfg, chunk)
        t0 = time.time()
        state = run(state0, springs, membranes)
        sync(state)
        compile_s = time.time() - t0
        t0 = time.time()
        reps = 0
        while reps < 5 and time.time() - t0 < 60:
            state = run(state, springs, membranes)
            sync(state)
            reps += 1
        wall = time.time() - t0
        ms = wall / (reps * chunk) * 1e3
        pps = n * reps * chunk / wall
        fin = bool(np.isfinite(np.asarray(state.pos)).all())
        print(f"block={block} ccol={ccol} R={r_every}: compile {compile_s:.1f}s, "
              f"{ms:.2f} ms/step, {pps/1e6:.2f}M psteps/s, finite={fin}",
              flush=True)


if __name__ == "__main__":
    main()
