"""True checkpoint/resume.

The reference's only persistence is the position-only dump/replay pair
(`/root/reference/src/owHelper.cpp:1640-1805`) — velocities are never saved,
so a "restart" replays frames rather than continuing physics. Here a
checkpoint is the complete simulation state (positions, velocities, types,
normals, muscle phase, step counter, spring graph, membranes, scene colors),
so a restored run continues bit-for-bit.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import MUSCLE_COUNT
from ..core.state import FluidState, Membranes, Springs


def save_checkpoint(
    path: str,
    state: FluidState,
    springs: Springs,
    membranes: Membranes,
    color: np.ndarray | None = None,
    extra: dict | None = None,
) -> None:
    payload = dict(
        pos=np.asarray(state.pos),
        vel=np.asarray(state.vel),
        ptype=np.asarray(state.ptype),
        normal=np.asarray(state.normal),
        muscle_activation=np.asarray(state.muscle_activation),
        step=np.asarray(state.step),
        spring_rows=np.asarray(springs.row_ids),
        spring_idx=np.asarray(springs.idx),
        spring_rest=np.asarray(springs.rest),
        spring_muscle=np.asarray(springs.muscle),
        tris=np.asarray(membranes.tris),
        particle_tris=np.asarray(membranes.particle_tris),
    )
    if color is not None:
        payload["color"] = np.asarray(color)
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    # atomic: a crash mid-write (or a kill while the async IO thread is
    # saving) can never leave a truncated archive at the target path
    from .async_io import save_npz_atomic

    save_npz_atomic(path if path.endswith(".npz") else path + ".npz",
                    **payload)


def load_checkpoint(path: str):
    """Returns (state, springs, membranes, color-or-None)."""
    z = np.load(path)
    state = FluidState(
        pos=jnp.asarray(z["pos"]),
        vel=jnp.asarray(z["vel"]),
        ptype=jnp.asarray(z["ptype"]),
        normal=jnp.asarray(z["normal"]),
        muscle_activation=jnp.asarray(
            z.get("muscle_activation", np.zeros(MUSCLE_COUNT, np.float32))
        ),
        step=jnp.asarray(z["step"]),
    )
    springs = Springs(
        row_ids=jnp.asarray(z["spring_rows"]),
        idx=jnp.asarray(z["spring_idx"]),
        rest=jnp.asarray(z["spring_rest"]),
        muscle=jnp.asarray(z["spring_muscle"]),
    )
    membranes = Membranes(
        tris=jnp.asarray(z["tris"]),
        particle_tris=jnp.asarray(z["particle_tris"]),
    )
    color = z["color"] if "color" in z else None
    return state, springs, membranes, color
