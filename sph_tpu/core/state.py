"""Device-side simulation state as explicit SoA pytrees.

The reference packs everything into overloaded float4 buffers — particle type
in ``position.w``, boundary wall normals inside the velocity buffer, membrane
delta-accumulators in the second halves of position/velocity
(`/root/reference/src/owOpenCLSolver.cpp:32-44`, `src/sphFluid.cl:860,1224`).
Here every quantity is its own fixed-shape array, which is what XLA wants and
what makes sharding annotations possible.

Index-space convention: **all particle references (neighbors, springs,
membrane triangles) use original particle indices.** The per-step spatial sort
is internal to the grid build. The reference instead runs kernels in sorted
space with a ``particleIndexBack`` inverse permutation and a load-path
dependent elastic offset (`owOpenCLSolver.cpp:435`); none of that exists here.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from ..constants import (
    MAX_MEMBRANES_PER_PARTICLE,
    MAX_NEIGHBORS,
    MUSCLE_COUNT,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FluidState:
    """Per-particle dynamic state. Shapes: N = total particle count."""

    pos: jax.Array            # [N,3] f32, sim units
    vel: jax.Array            # [N,3] f32, scaled SI (m/s)
    ptype: jax.Array          # [N]   i32, LIQUID/ELASTIC/BOUNDARY
    normal: jax.Array         # [N,3] f32, outward wall normal (boundary only)
    muscle_activation: jax.Array  # [MUSCLE_COUNT] f32 in [0,1]
    step: jax.Array           # []    i32, completed-step counter

    @property
    def n_particles(self) -> int:
        return self.pos.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Springs:
    """Elastic connection graph, padded to MAX_NEIGHBORS per elastic particle.

    Counterpart of ``elasticConnectionsData`` (`owOpenCLSolver.cpp:84-85`,
    filled at `owHelper.cpp:998-1001`) with the float-packed fields split out:
    reference stores (j + 0.1, r_ij0_scaled * 0.95, muscle_id, 0) as float4.
    """

    row_ids: jax.Array  # [Ne]    i32 absolute particle id owning the row
    idx: jax.Array      # [Ne,32] i32 absolute neighbor ids, -1 pad
    rest: jax.Array     # [Ne,32] f32 rest length, scaled SI meters
    muscle: jax.Array   # [Ne,32] i32 muscle id 1..96, 0 = plain spring

    @property
    def n_elastic(self) -> int:
        return self.row_ids.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Membranes:
    """Triangular membrane mesh over elastic particles.

    ``tris`` mirrors ``membraneData`` (`owOpenCLSolver.cpp:70-71`);
    ``particle_tris`` mirrors ``particleMembranesList``
    (`owHelper.cpp:1408-1423`) but is indexed by absolute particle id
    (rows for non-elastic particles are all -1) so no offset bookkeeping
    is needed.
    """

    tris: jax.Array           # [M,3] i32 vertex particle ids
    particle_tris: jax.Array  # [N,7] i32 triangle ids, -1 pad

    @property
    def n_tris(self) -> int:
        return self.tris.shape[0]


def empty_springs() -> Springs:
    z = jnp.zeros((0, MAX_NEIGHBORS), dtype=jnp.int32)
    return Springs(
        row_ids=jnp.zeros((0,), dtype=jnp.int32),
        idx=z,
        rest=jnp.zeros((0, MAX_NEIGHBORS), dtype=jnp.float32),
        muscle=z,
    )


def empty_membranes(n_particles: int) -> Membranes:
    return Membranes(
        tris=jnp.zeros((0, 3), dtype=jnp.int32),
        particle_tris=jnp.full(
            (n_particles, MAX_MEMBRANES_PER_PARTICLE), -1, dtype=jnp.int32
        ),
    )


def make_state(
    pos: np.ndarray,
    vel: np.ndarray,
    ptype: np.ndarray,
    normal: np.ndarray | None = None,
) -> FluidState:
    """Build a FluidState from host arrays.

    ``vel`` rows for boundary particles are interpreted as wall normals (the
    reference's storage trick, `sphFluid.cl:860`) **only** if ``normal`` is
    not given; pass ``normal`` explicitly for new-style scenes.
    """
    pos = np.asarray(pos, dtype=np.float32)
    vel = np.asarray(vel, dtype=np.float32)
    ptype = np.asarray(ptype, dtype=np.int32)
    n = pos.shape[0]
    if normal is None:
        from ..constants import BOUNDARY_PARTICLE

        is_b = (ptype == BOUNDARY_PARTICLE)[:, None]
        normal = np.where(is_b, vel, 0.0).astype(np.float32)
        vel = np.where(is_b, 0.0, vel).astype(np.float32)
    else:
        normal = np.asarray(normal, dtype=np.float32)
    return FluidState(
        pos=jnp.asarray(pos),
        vel=jnp.asarray(vel),
        ptype=jnp.asarray(ptype),
        normal=jnp.asarray(normal),
        muscle_activation=jnp.zeros((MUSCLE_COUNT,), dtype=jnp.float32),
        step=jnp.zeros((), dtype=jnp.int32),
    )
