"""At-scale throughput: multi-worm and ~1M-particle dam-break on the
fast and fastw engines (SURVEY §7 step 6-7 stress configs; VERDICT r4
#8: keep the at-scale table fresh after engine changes). Run on the
real chip:

    python scripts/bench_scale.py [n_worms] [fill] [engine]

engine: "fastw" (default; falls back to fast for wall-anchored scenes),
"fast", or "both".
"""
import os
os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("SPH_TPU_DMA_DEPTH", "8")
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sph_tpu.config import SimParams
from sph_tpu.core.fast import compute_fast_config, make_fast_multi_step
from sph_tpu.core.fastw import (
    compute_fastw_config,
    make_fastw_multi_step,
    precompute_wall_static,
)
from sph_tpu.scene import (
    generate_liquid_box_scene,
    generate_multi_worm_params,
    generate_multi_worm_scene,
)

CHUNK = 30


def measure(name, scene, params, engine="fastw", chunk=CHUNK, rounds=4):
    state, springs, membranes = scene.device_state()
    layout = scene.layout()
    if engine == "fastw":
        cfg = compute_fastw_config(scene.pos, params, layout,
                                   ptype=scene.ptype,
                                   block=256, ccol=512, ccol_c=256)
        ws = precompute_wall_static(scene.pos, scene.normal, params,
                                    layout, cfg)
        run = make_fastw_multi_step(params, layout, cfg, chunk,
                                    wall_static=ws)
    else:
        cfg = compute_fast_config(scene.pos, params)
        run = make_fast_multi_step(params, layout, cfg, chunk)
    n = scene.n_particles
    t0 = time.time()
    state = run(state, springs, membranes)
    float(np.asarray(state.pos[0]).sum())
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(rounds):
        state = run(state, springs, membranes)
    float(np.asarray(state.pos[0]).sum())
    wall = time.time() - t0
    steps = rounds * chunk
    ms = wall / steps * 1e3
    pps = n * steps / wall
    pos = np.asarray(state.pos)[: n]
    ok = bool(np.isfinite(pos).all())
    print(f"{name} [{engine}]: {n} particles, {ms:.1f} ms/step, "
          f"{pps/1e6:.2f}M particle-steps/s, compile {compile_s:.0f}s, "
          f"finite={ok}", flush=True)
    return pps


def main():
    n_worms = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    fill = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    engine = sys.argv[3] if len(sys.argv) > 3 else "fastw"
    engines = ("fast", "fastw") if engine == "both" else (engine,)

    base = SimParams()
    t0 = time.time()
    mscene = generate_multi_worm_scene(n_worms, base)
    wide = generate_multi_worm_params(n_worms, base)
    print(f"{n_worms}-worm scene: {mscene.counts} "
          f"(build {time.time()-t0:.0f}s)", flush=True)
    for eng in engines:
        measure(f"{n_worms}-worm", mscene, wide, engine=eng)

    t0 = time.time()
    dscene = generate_liquid_box_scene(base, fill_fraction=fill)
    print(f"dam-break fill={fill}: {dscene.counts} "
          f"(build {time.time()-t0:.0f}s)", flush=True)
    for eng in engines:
        measure("dam-break", dscene, base, engine=eng)


if __name__ == "__main__":
    main()
