"""Device mesh construction and scene padding for SPMD runs.

The reference has no multi-device story at all (single OpenCL queue,
`/root/reference/src/owOpenCLSolver.cpp:95-211`); here scaling is a
first-class component: a 1-D ``jax.sharding.Mesh`` over the particle axis,
with collectives riding ICI.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from ..constants import BOUNDARY_PARTICLE
from ..scene.scene import Scene

PARTICLE_AXIS = "p"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (PARTICLE_AXIS,))


def make_mesh2(n_slices: int, chips_per_slice: int) -> Mesh:
    """Two-level (slices x chips) mesh for multi-host / multi-slice runs,
    flattened SLICE-MAJOR onto the particle axis.

    The halo engine's communication is a 1-D neighbor chain over sorted
    z-slabs, so the two-level topology reduces to device ORDER: with
    slice-major flattening, rank i and i+1 share a slice (ICI) except at
    the ``n_slices - 1`` slice boundaries (DCN). Per step, each edge
    carries the fixed halo bands (~1.02 MB/step/device measured on the
    worm at halo_pad=5120, r3) — so DCN sees only 2/(ndev) of edge
    traffic, independent of scale. Collectives that touch every device —
    the distributed resort's [ndev, n_cells] histogram all-gather and the
    O(npen)/O(n_el) psums, plus the once-per-call entry/exit O(N)
    gathers — cross DCN hierarchically (XLA reduces intra-slice over ICI
    first).

    On a real multi-host pod ``jax.devices()`` already enumerates
    process-major (= slice-major), so this ordering is the physical one;
    under ``xla_force_host_platform_device_count`` it simulates it.
    """
    need = n_slices * chips_per_slice
    devs = jax.devices()
    assert len(devs) >= need, (
        f"mesh2 {n_slices}x{chips_per_slice} needs {need} devices, "
        f"have {len(devs)}"
    )
    arr = np.asarray(devs[:need]).reshape(n_slices, chips_per_slice)
    return Mesh(arr.reshape(-1), (PARTICLE_AXIS,))


def dcn_edges(n_slices: int, chips_per_slice: int) -> list[tuple[int, int]]:
    """The (rank, rank+1) halo-exchange edges that cross a slice (DCN)
    boundary under the slice-major order of :func:`make_mesh2`."""
    return [
        (k * chips_per_slice - 1, k * chips_per_slice)
        for k in range(1, n_slices)
    ]


def pad_scene_to_devices(scene: Scene, n_devices: int) -> Scene:
    """Pad the particle count to a multiple of the device count.

    Padding particles are frozen BOUNDARY particles parked on a line along
    the top-far box edge at r0-ish spacing so they don't stack in one cell.
    They carry the inward edge normal of that corner (like a real wall-edge
    particle, owHelper.cpp:785-826) rather than a zero normal: a zero-normal
    boundary row would still inflate the Ihmsen w/w2 sums while contributing
    nothing to n_ci, biasing the position projection of any liquid that came
    within r0.
    """
    n = scene.n_particles
    pad = (-n) % n_devices
    if pad == 0:
        return scene
    x_hi = scene.pos[:, 0].max()
    y_hi = scene.pos[:, 1].max()
    z_lo = scene.pos[:, 2].min()
    z_hi = scene.pos[:, 2].max()
    zs = z_lo + (np.arange(pad) + 0.5) * (z_hi - z_lo) / pad
    ppos = np.stack(
        [np.full(pad, x_hi), np.full(pad, y_hi), zs], axis=1
    ).astype(np.float32)
    s = np.float32(-1.0 / np.sqrt(2.0))
    pnorm = np.tile(np.array([[s, s, 0.0]], np.float32), (pad, 1))
    return Scene(
        pos=np.concatenate([scene.pos, ppos]),
        vel=np.concatenate([scene.vel, np.zeros((pad, 3), np.float32)]),
        color=np.concatenate(
            [scene.color, np.full(pad, float(BOUNDARY_PARTICLE), np.float32)]
        ),
        normal=np.concatenate([scene.normal, pnorm]),
        spring_rows=scene.spring_rows,
        spring_idx=scene.spring_idx,
        spring_rest=scene.spring_rest,
        spring_type=scene.spring_type,
        tris=scene.tris,
        muscle_model=scene.muscle_model,
    )
