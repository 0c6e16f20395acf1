"""Physics A/B of the shipped stale-window config (VERDICT r3 #4).

STATUS: live instrument. Runs the worm at resort_every=1 (fresh windows
every step — the semantics-exact baseline) vs resort_every=30 (the
shipped bench config) for the same horizon and compares what the
simulation is FOR, not just positions:

* COM-z displacement trajectory of the elastic body (propulsion)
* gait amplitude: RMS lateral (x and y) midline deflection of the
  elastic shell, binned along z (~24 bins = muscle rows)
* gait phase: z-lag of the best cross-correlation between the two
  arms' midline profiles at matched steps
* max spring strain (shape integrity)
* boundary-shell density: median exact density of liquid particles
  within 2h of a wall (start / end; exact neighbor search)

Run on the real chip:  python scripts/resort_ab.py [--steps 20000]
Appends a results table to BASELINE.md with --record.
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def midline_profile(pos, el_mask, z_edges):
    """Per-z-bin mean lateral position of the elastic body: [nbins, 2] (x, y)."""
    p = pos[el_mask]
    which = np.clip(np.searchsorted(z_edges, p[:, 2]) - 1, 0, len(z_edges) - 2)
    nb = len(z_edges) - 1
    out = np.zeros((nb, 2))
    for b in range(nb):
        m = which == b
        if m.any():
            out[b, 0] = p[m, 0].mean()
            out[b, 1] = p[m, 1].mean()
    return out


def shell_density(state, params):
    """Median exact density of liquid particles within 2h of any wall."""
    import jax.numpy as jnp
    from sph_tpu.core.step import diagnostics
    from sph_tpu.constants import LIQUID_PARTICLE

    d = diagnostics(state, params)
    pos = np.asarray(state.pos)
    rho = np.asarray(d["rho"])
    liq = np.asarray(state.ptype) == LIQUID_PARTICLE
    h2 = 2 * params.h
    near = (
        (pos[:, 0] - params.x_min < h2) | (params.x_max - pos[:, 0] < h2)
        | (pos[:, 1] - params.y_min < h2) | (params.y_max - pos[:, 1] < h2)
        | (pos[:, 2] - params.z_min < h2) | (params.z_max - pos[:, 2] < h2)
    )
    sel = liq & near
    return float(np.median(rho[sel])) if sel.any() else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--chunk", type=int, default=30)
    ap.add_argument("--report-every", type=int, default=600)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--box", action="store_true",
                    help="tiny liquid-box smoke scene instead of the worm "
                    "(CPU-checkable; gait columns read as liquid sloshing)")
    ap.add_argument("--arms", default="1,30",
                    help="comma-separated resort_every values")
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--skip-density", action="store_true",
                    help="skip the exact-density shell measurement")
    args = ap.parse_args()

    from sph_tpu.config import SimParams
    from sph_tpu.scene import generate_liquid_box_scene, generate_worm_scene
    from sph_tpu.core.fast import compute_fast_config, make_fast_multi_step
    from sph_tpu.constants import ELASTIC_PARTICLE, LIQUID_PARTICLE

    H = 3.34
    if args.box:
        params = SimParams(x_max=8 * H, y_max=8 * H, z_max=8 * H)
    elif args.small:
        params = SimParams(x_max=14 * H, y_max=12 * H, z_max=108 * H)
    else:
        params = SimParams()
    t0 = time.time()
    scene = (generate_liquid_box_scene(params, fill_fraction=0.5)
             if args.box else generate_worm_scene(params))
    print(f"scene: {scene.n_particles} particles {scene.counts} "
          f"({time.time()-t0:.1f}s)", flush=True)

    el = np.asarray(scene.ptype) == ELASTIC_PARTICLE
    if not el.any():  # box smoke: track the liquid body instead
        el = np.asarray(scene.ptype) == LIQUID_PARTICLE
    z0, z1 = scene.pos[el][:, 2].min(), scene.pos[el][:, 2].max()
    z_edges = np.linspace(z0 - 1e-3, z1 + 1e-3, 25)  # 24 muscle-row bins
    rest = np.asarray(scene.spring_rest)
    sidx = np.asarray(scene.spring_idx)
    rows = np.asarray(scene.spring_rows)
    valid = sidx >= 0
    scale = params.simulation_scale

    def strain(pos):
        if not len(rows):
            return 0.0
        d = pos[rows][:, None, :] - pos[np.maximum(sidx, 0)]
        r = np.linalg.norm(d, axis=2) * scale
        s = np.abs(np.where(valid & (rest > 0), r / np.maximum(rest, 1e-30),
                            1.0) - 1.0)
        return float(s.max())

    arms = {}
    for r_every in [int(s) for s in args.arms.split(",")]:
        state, springs, membranes = scene.device_state()
        layout = scene.layout()
        cfg = compute_fast_config(scene.pos, params, resort_every=r_every)
        # the multi-step graph resorts at each sweep entry, so the call
        # length must be a multiple of r_every or the arm's actual
        # resort period silently becomes the chunk length
        chunk = (-(-args.chunk // r_every) * r_every
                 if r_every < args.chunk else r_every)
        run = make_fast_multi_step(params, layout, cfg, chunk)
        p0 = np.asarray(state.pos)
        com0 = p0[el].mean(axis=0)
        rho_sh0 = (float("nan") if args.skip_density
                   else shell_density(state, params))
        rec = {"com_z": [], "strain": [], "mid": [], "steps": [],
               "rho_shell0": rho_sh0, "com0": com0}
        t0 = time.time()
        done = 0
        while done < args.steps:
            for _ in range(max(1, args.report_every // chunk)):
                state = run(state, springs, membranes)
                done += chunk
            pos = np.asarray(state.pos)
            assert np.isfinite(pos).all(), "non-finite state"
            rec["steps"].append(done)
            rec["com_z"].append(float(pos[el][:, 2].mean()))
            rec["strain"].append(strain(pos))
            rec["mid"].append(midline_profile(pos, el, z_edges))
            print(f"[resort={r_every}] step {done:6d} "
                  f"com_z d={rec['com_z'][-1]-com0[2]:+.4f} "
                  f"strain={rec['strain'][-1]:.3f} "
                  f"{(time.time()-t0)/done*1e3:.1f} ms/step", flush=True)
        rec["wall_s"] = time.time() - t0
        rec["ms_per_step"] = rec["wall_s"] / done * 1e3
        rec["rho_shell1"] = (float("nan") if args.skip_density
                             else shell_density(state, params))
        rec["final_pos"] = np.asarray(state.pos)
        arms[r_every] = rec

    # --- comparison ---------------------------------------------------
    keys = sorted(arms)
    ref = arms[keys[0]]
    scene_name = ("liquid box" if args.box
                  else ("small worm" if args.small else "full worm"))
    import jax
    backend = jax.default_backend()
    lines = [f"\n### Resort A/B ({args.steps} steps, {scene_name}, "
             f"{scene.n_particles} particles, backend={backend}) "
             f"— VERDICT r3 #4\n",
             "| resort_every | steps | ms/step | COM-z displ | "
             "max strain (end) | "
             "gait amp x/y (end) | shell rho start->end |",
             "|---|---|---|---|---|---|---|"]
    for k in keys:
        a = arms[k]
        dz = a["com_z"][-1] - a["com0"][2]
        mid = a["mid"][-1]
        amp = mid - mid.mean(axis=0)
        lines.append(
            f"| {k} | {a['steps'][-1]} | {a['ms_per_step']:.1f} | {dz:+.4f} | "
            f"{a['strain'][-1]:.3f} | "
            f"{np.sqrt((amp[:,0]**2).mean()):.3f}/"
            f"{np.sqrt((amp[:,1]**2).mean()):.3f} | "
            f"{a['rho_shell0']:.1f} -> {a['rho_shell1']:.1f} |")
    if len(keys) > 1:
        b = arms[keys[1]]
        # phase: z-bin lag maximizing cross-correlation of y-midlines
        ya = ref["mid"][-1][:, 1] - ref["mid"][-1][:, 1].mean()
        yb = b["mid"][-1][:, 1] - b["mid"][-1][:, 1].mean()
        xc = [float(np.dot(np.roll(ya, s), yb)) for s in range(-4, 5)]
        lag = int(np.argmax(xc)) - 4
        dcom = abs((b["com_z"][-1] - b["com0"][2])
                   - (ref["com_z"][-1] - ref["com0"][2]))
        dpos = float(np.abs(b["final_pos"] - ref["final_pos"]).max())
        lines.append(
            f"\n- arms {keys[0]} vs {keys[1]}: |dCOM-z| = {dcom:.4f} sim "
            f"units, gait phase lag = {lag} z-bins "
            f"(bin = {float(z_edges[1]-z_edges[0]):.1f} sim units), "
            f"max |dpos| = {dpos:.3f} (chaotic divergence, for scale)")
    report = "\n".join(lines) + "\n"
    print(report)
    if args.record:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BASELINE.md"), "a") as fh:
            fh.write(report)
    return 0


if __name__ == "__main__":
    sys.exit(main())
