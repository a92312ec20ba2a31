"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: tuple[int, ...] | None = None,
              axis_names: tuple[str, ...] = ("i",)) -> Mesh:
    """Build a Mesh over the available devices.

    Default: 1-D mesh over all devices with axis "i". Pass ``shape`` for 2-D
    layouts (e.g. (2, 4) with ("i", "j")).
    """
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"Mesh shape {shape} needs {n} devices, have {len(devices)}")
    if len(axis_names) != len(shape):
        raise ValueError(f"Mesh shape {shape} needs {len(shape)} axis names, "
                         f"got {axis_names}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)
