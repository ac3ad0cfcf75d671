"""Mesh construction helpers for the distributed join tier."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def data_mesh(n_devices: int | None = None, axis_name: str = "x") -> Mesh:
    """1-D mesh over the first n_devices devices (join sharding axis).

    The join is embarrassingly hash-parallel, so a single mesh axis carries
    both sides; n_devices must be a power of two (destination device id is a
    bit-slice of the hash, parallel/shuffle.py).
    """
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devices)
    if n & (n - 1):
        raise ValueError(f"n_devices must be a power of two, got {n}")
    return Mesh(np.asarray(devices), (axis_name,))
