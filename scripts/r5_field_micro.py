"""Measure the precomputed-wall-FIELD design (VERDICT r4 #1, round 5).

STATUS: live instrument (r5). The r4 verdict's unrefuted structural
lever: walls never move, so their contribution to any field at position
x is a static function f(x); precompute f on a grid and replace the
moving<-wall pair passes with trilinear lookups. Of fastw's 9
moving<-shell pass invocations per step, 6 are static-field-replaceable
(density, 3x rho*, viscsurf-with-static-normals, Ihmsen boundary sums);
the 3 paccel invocations read per-iteration wall pressures and must
stay live. This script measures BOTH halves of the decision:

  A. CHIP COST: trilinear sample of 8 packed scalar fields at the n_mov
     moving positions from a dense grid, inside a 30-step scan (the
     in-step usage shape), at h/2 and h/4 node spacing — against the
     ~0.6 ms/invocation the live passes cost (r5 ablation: ms marginal
     5.28 ms / 9 invocations).

  B. HOST ACCURACY (f64, no chip): exact wall t^3 density sums and
     Ihmsen w/w2 sums at probe points near the worm-scene pool wall vs
     trilinear interpolation of the gridded field — the physics
     deviation the field design would introduce (the poly6^3 kernel is
     smooth; the Ihmsen w = max(0,(r0-r)/r0) sum has an r0-scale kink,
     expected to interpolate worse).

Run: python scripts/r5_field_micro.py [--cpu]
"""
import os
import sys

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
else:
    os.environ["JAX_PLATFORMS"] = ""
import json
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sph_tpu.config import SimParams
from sph_tpu.scene import generate_worm_scene
from sph_tpu.constants import BOUNDARY_PARTICLE

params = SimParams()
scene = generate_worm_scene(params)
is_w = scene.ptype == BOUNDARY_PARTICLE
pos_w = scene.pos[is_w].astype(np.float64)
pos_m = scene.pos[~is_w].astype(np.float32)
n_mov = len(pos_m)
h = float(params.h)
r0 = float(params.r0)
lo = np.asarray(params.box_min, np.float64)
hi = np.asarray(params.box_max, np.float64)
print(f"scene: {scene.n_particles} ({n_mov} moving, {len(pos_w)} wall); "
      f"box {np.round(hi - lo, 1)}", flush=True)

rec = {}

# ---------------------------------------------------------------- B
from scipy.spatial import cKDTree

tree = cKDTree(pos_w)


def exact_fields(pts):
    """f64 wall sums at pts: t3 density, Ihmsen w and w2 sums."""
    out = np.zeros((len(pts), 3), np.float64)
    nb = tree.query_ball_point(pts, r=h)
    for i, js in enumerate(nb):
        if not js:
            continue
        d = np.linalg.norm(pos_w[js] - pts[i], axis=1)
        t = np.maximum(h * h - d * d, 0.0)
        out[i, 0] = np.sum(t ** 3)
        w = np.maximum(0.0, (r0 - d) / r0)
        out[i, 1] = np.sum(w)
        out[i, 2] = np.sum(w * w)
    return out


# accuracy is studied on a 8h-cube subregion around a pool-floor wall
# particle (the field is local; a subgrid anchored the same way the
# full grid would be gives identical interpolation error, at a node
# count the 1-core host can evaluate exactly)
anchor = pos_w[np.argmin(pos_w[:, 1] + 0.1 * np.abs(
    pos_w[:, 2] - pos_w[:, 2].mean()))]
sub_lo = np.maximum(anchor - 4 * h, lo)
sub_hi = np.minimum(anchor + 4 * h, hi)


def field_on_grid(sp):
    ax = [np.arange(sub_lo[k], sub_hi[k] + 2 * sp, sp) for k in range(3)]
    G = np.stack(np.meshgrid(*ax, indexing="ij"), -1).reshape(-1, 3)
    vals = exact_fields(G)
    return ax, vals.reshape(len(ax[0]), len(ax[1]), len(ax[2]), 3)


def trilinear(ax, F, pts):
    idx, frac = [], []
    for k in range(3):
        sp = ax[k][1] - ax[k][0]
        x = (pts[:, k] - ax[k][0]) / sp
        i = np.clip(np.floor(x).astype(int), 0, len(ax[k]) - 2)
        idx.append(i)
        frac.append(x - i)
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = ((frac[0] if dx else 1 - frac[0])
                     * (frac[1] if dy else 1 - frac[1])
                     * (frac[2] if dz else 1 - frac[2]))
                out = out + w[:, None] * F[idx[0] + dx, idx[1] + dy,
                                           idx[2] + dz]
    return out


# probe points: within h of the wall (where the field matters), around
# the pool floor/walls — sample real liquid-adjacent space
rng = np.random.default_rng(0)
probes = []
target = 4000
while len(probes) < target:
    cand = rng.uniform(sub_lo + h, sub_hi - h, size=(20000, 3))
    d, _ = tree.query(cand, k=1)
    keep = cand[(d < h) & (d > 0.2 * r0)]
    probes.extend(keep.tolist())
probes = np.asarray(probes[:target])
ex = exact_fields(probes)
scale = np.maximum(np.abs(ex), np.array([h ** 6, 1.0, 1.0]) * 1e-3)

print("\n-- B. field accuracy (trilinear vs exact f64, near-wall "
      "probes) --", flush=True)
for name, sp in (("h/2", h / 2), ("h/4", h / 4)):
    t0 = time.time()
    ax, F = field_on_grid(sp)
    build = time.time() - t0
    tri = trilinear(ax, F, probes)
    rel = np.abs(tri - ex) / scale
    nn = F.shape[0] * F.shape[1] * F.shape[2]
    print(f"spacing {name}: grid {F.shape[:3]} ({nn / 1e6:.1f}M nodes, "
          f"build {build:.0f}s)", flush=True)
    for j, fname in enumerate(("t3-density", "ihmsen-w", "ihmsen-w2")):
        print(f"  {fname:12s} max rel err {rel[:, j].max():.3e}  "
              f"mean {rel[:, j].mean():.3e}", flush=True)
    rec[f"acc_{name.replace('/', '_')}"] = {
        "nodes": int(nn),
        "max_rel": [float(rel[:, j].max()) for j in range(3)],
        "mean_rel": [float(rel[:, j].mean()) for j in range(3)],
    }

# ---------------------------------------------------------------- A
import jax
import jax.numpy as jnp

print("\n-- A. chip cost of trilinear sampling (8 packed fields, "
      f"{n_mov} points, 30-step scan) --", flush=True)


def chip_cost(sp, reps=5, steps=30):
    nx = int((hi[0] - lo[0]) / sp) + 2
    ny = int((hi[1] - lo[1]) / sp) + 2
    nz = int((hi[2] - lo[2]) / sp) + 2
    nn = nx * ny * nz
    F = jnp.asarray(rng.standard_normal((nn, 8)), jnp.float32)
    px = jnp.asarray(pos_m[:, 0])
    py = jnp.asarray(pos_m[:, 1])
    pz = jnp.asarray(pos_m[:, 2])
    inv = np.float32(1.0 / sp)
    l0 = [np.float32(v) for v in lo]

    def sample(px, py, pz):
        fx = (px - l0[0]) * inv
        fy = (py - l0[1]) * inv
        fz = (pz - l0[2]) * inv
        ix = jnp.clip(fx.astype(jnp.int32), 0, nx - 2)
        iy = jnp.clip(fy.astype(jnp.int32), 0, ny - 2)
        iz = jnp.clip(fz.astype(jnp.int32), 0, nz - 2)
        tx, ty, tz = fx - ix, fy - iy, fz - iz
        acc = jnp.zeros((px.shape[0], 8), jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = ((tx if dx else 1 - tx) * (ty if dy else 1 - ty)
                         * (tz if dz else 1 - tz))
                    flat = ((ix + dx) * ny + (iy + dy)) * nz + (iz + dz)
                    acc = acc + w[:, None] * F[flat]
        return acc

    @jax.jit
    def run(px, py, pz):
        def body(c, _):
            x, y, z = c
            a = sample(x, y, z)
            # fold the sample back so the loop carries a dependency
            x = x + 1e-12 * a[:, 0]
            return (x, y, z), None

        c, _ = jax.lax.scan(body, (px, py, pz), None, length=steps)
        return c

    out = run(px, py, pz)
    jax.block_until_ready(out)
    float(np.asarray(out[0])[0])
    t0 = time.time()
    for _ in range(reps):
        out = run(*out)
    float(np.asarray(out[0])[0])
    ms = (time.time() - t0) / (reps * steps) * 1e3
    hbm = nn * 8 * 4 / 1e6
    print(f"spacing h/{h / sp:.0f}: {nn / 1e6:.1f}M nodes "
          f"({hbm:.0f} MB HBM)  {ms:.3f} ms/step per sample pass",
          flush=True)
    return ms


rec["chip_ms_h2"] = chip_cost(h / 2)
rec["chip_ms_h4"] = chip_cost(h / 4)
print("\nlive ms-pass cost being replaced: ~0.6 ms/invocation x 6 "
      "field-replaceable invocations = ~3.5 ms/step "
      "(r5 fastw ablation: ms marginal 5.28 / 9 invocations)",
      flush=True)

out_p = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "r5", "field_micro.json")
with open(out_p, "w") as f:
    json.dump(rec, f, indent=1)
print("EXIT=0", flush=True)
