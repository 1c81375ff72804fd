"""Device mesh construction.

The reference's only strategy is synchronous data parallelism over
MirroredStrategy/NCCL (/root/reference/model/model_util/distributer.py:9-44,
SURVEY.md §2.7). The TPU-native equivalent is a 1-D ``("data",)`` mesh
with XLA-compiled collectives over ICI. Extra axes ("model", "spatial")
are accepted as forward-compatible hooks for tensor/spatial sharding but
default to size 1 -- conv nets up to EfficientNetB7 fit a single chip.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def make_mesh(shape: Mapping[str, int] | None = None,
              devices: Sequence | None = None) -> Mesh:
    """Create a Mesh; default shape puts every device on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"data": len(devices)}
    axis_names = tuple(shape.keys())
    dims = tuple(shape.values())
    total = int(np.prod(dims))
    if total != len(devices):
        raise ValueError(f"mesh shape {shape} needs {total} devices, "
                         f"have {len(devices)}")
    dev_mesh = mesh_utils.create_device_mesh(dims, devices=devices)
    return Mesh(dev_mesh, axis_names)
