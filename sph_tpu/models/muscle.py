"""Muscle activation signal generator.

The reference embeds CPython 2.7 and calls ``muscle_simulation.run()`` every
step (`/root/reference/src/PyramidalSimulation.cpp:54-93`,
`src/main_sim.py:4-53`): two traveling sine waves over 12 body rows,
phase-shifted by pi, normalized to [0,1], each value duplicated (left/right
muscle of a row) and concatenated as [w1, w2, w2, w1] -> 96 values in
quadrant order MDR, MVR, MVL, MDL. Since the model is closed-form we compute
it *inside* the jitted step from the step counter — no host boundary at all.
A precomputed-schedule path is provided for arbitrary (e.g. learned neural)
activation sources.

Timing matches the reference driver (`owPhysicsFluidSimulator.cpp:134-141`):
step k runs with the signal emitted after step k-1 (i.e. waves(t = k - 1));
step 0 runs with all-zero activation.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..constants import ACTIVE_MUSCLE_COUNT, MUSCLE_COUNT

_N_ROWS = 12            # main_sim.py: n=24 muscles/wave, j = n/2 rows
_SPAN = 1.5 * 2 * math.pi
_WAVE_VELOCITY = 1e-4   # main_sim.py:8
_INCREMENT = 1.0        # main_sim.py:43


def waves_signal(t: jax.Array) -> jax.Array:
    """Activation vector [MUSCLE_COUNT] for wave time ``t`` (float scalar)."""
    row = jnp.linspace(0.0, _SPAN, _N_ROWS, dtype=jnp.float32)
    phase = jnp.float32(_WAVE_VELOCITY) * t * jnp.float32(_INCREMENT)
    w1 = (jnp.sin(row - phase) + 1.0) * 0.5
    w2 = (jnp.sin(row + jnp.float32(math.pi) - phase) + 1.0) * 0.5
    d1 = jnp.repeat(w1, 2)  # duplicate per row: left/right muscle
    d2 = jnp.repeat(w2, 2)
    sig = jnp.concatenate([d1, d2, d2, d1])  # MDR, MVR, MVL, MDL
    pad = MUSCLE_COUNT - ACTIVE_MUSCLE_COUNT
    return jnp.concatenate([sig, jnp.zeros((pad,), dtype=jnp.float32)])


def next_activation(step: jax.Array) -> jax.Array:
    """Signal to apply during step ``step + 1`` (emitted at end of ``step``)."""
    return waves_signal(step.astype(jnp.float32))


def schedule(n_steps: int) -> jax.Array:
    """Precomputed [n_steps, MUSCLE_COUNT] activation table.

    Row k is the activation *used by* step k (row 0 is all zeros, matching
    the reference's zero-initialized signal buffer,
    `owPhysicsFluidSimulator.cpp:51-54`).
    """
    t = jnp.arange(-1, n_steps - 1, dtype=jnp.float32)
    table = jax.vmap(waves_signal)(t)
    return table.at[0].set(0.0)
