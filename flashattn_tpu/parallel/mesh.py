"""Mesh construction helpers.

Axis convention used across the package (models/, parallel/, __graft_entry__):

  * ``data``  — batch (DP); gradients all-reduced across it.
  * ``model`` — attention heads / MLP columns (TP); zero-comm attention.
  * ``seq``   — sequence/context (SP); ring attention or Ulysses all-to-all.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1, model: int = 1, seq: int = 1, *, devices=None
) -> Mesh:
    """Build a ``(data, model, seq)`` mesh from the available devices."""
    if devices is None:
        devices = jax.devices()
    n = data * model * seq
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{model}x{seq}={n} exceeds {len(devices)} devices"
        )
    arr = np.array(devices[:n]).reshape(data, model, seq)
    return Mesh(arr, axis_names=("data", "model", "seq"))
