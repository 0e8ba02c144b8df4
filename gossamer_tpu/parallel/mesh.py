"""Device mesh helpers for multi-chip execution."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first n devices (axis "d")."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("d",))
