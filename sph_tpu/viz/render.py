"""Offline rendering of simulation states and dumped trajectories.

Replaces the reference's GLUT window (`/root/reference/src/
owWorldSimulation.cpp:100-358`) with headless matplotlib output: the same
density-based coloring bands (+-4% around rho0, `owWorldSimulation.cpp:
129-142`) and particle-class colors, but written as PNGs from a live state or
a ``position_buffer.txt`` replay — the `-l_from` path without a GL stack.
"""
from __future__ import annotations

import os

import numpy as np

from ..constants import BOUNDARY_PARTICLE, ELASTIC_PARTICLE, LIQUID_PARTICLE


def _colors(ptype: np.ndarray, rho: np.ndarray | None, rho0: float):
    c = np.zeros((len(ptype), 3))
    c[ptype == BOUNDARY_PARTICLE] = (0.4, 0.4, 0.4)
    c[ptype == ELASTIC_PARTICLE] = (0.9, 0.8, 0.2)
    liq = ptype == LIQUID_PARTICLE
    if rho is None:
        c[liq] = (0.2, 0.4, 0.9)
    else:
        # density bands as in the reference HUD: blue below rho0-4%,
        # green near rho0, red above rho0+4%
        r = rho[liq]
        t = np.clip((r - rho0 * 0.96) / (rho0 * 0.08), 0.0, 1.0)
        band = np.stack([t, 0.6 * (1 - np.abs(2 * t - 1)), 1.0 - t], axis=1)
        c[liq] = band
    return c


def render_frame(
    pos: np.ndarray,
    ptype: np.ndarray,
    out_path: str,
    rho: np.ndarray | None = None,
    rho0: float = 1000.0,
    axes: tuple[int, int] = (2, 1),
    show_boundary: bool = False,
    title: str | None = None,
    point_size: float = 1.0,
):
    """Scatter one frame onto the (axes[0], axes[1]) plane (default z-y,
    the worm's side view)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pos = np.asarray(pos)
    ptype = np.asarray(ptype)
    keep = np.ones(len(pos), bool)
    if not show_boundary:
        keep = ptype != BOUNDARY_PARTICLE
    c = _colors(ptype, rho, rho0)

    fig, ax = plt.subplots(figsize=(14, 4), dpi=110)
    ax.scatter(pos[keep, axes[0]], pos[keep, axes[1]],
               c=c[keep], s=point_size, linewidths=0)
    ax.set_aspect("equal")
    ax.set_facecolor("black")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def render_trajectory(
    buffer_path: str,
    out_dir: str,
    every: int = 1,
    **kw,
):
    """Render a dumped position_buffer.txt into numbered PNGs (replay mode,
    reference `-l_from`)."""
    from ..scene.io import load_trajectory

    n_e, n_l, frames = load_trajectory(buffer_path)
    paths = []
    for t in range(0, len(frames), every):
        f = frames[t]
        paths.append(render_frame(
            f[:, :3], f[:, 3].astype(np.int32),
            os.path.join(out_dir, f"frame_{t:05d}.png"),
            title=f"frame {t}", **kw,
        ))
    return paths
