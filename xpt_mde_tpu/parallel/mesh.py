"""Device mesh construction.

The reference's only strategy is synchronous data parallelism over
MirroredStrategy/NCCL (/root/reference/model/model_util/distributer.py:9-44,
SURVEY.md §2.7). The TPU-native equivalent is a 1-D ``("data",)`` mesh
with XLA-compiled collectives over ICI. A 2-D ``("data", "spatial")``
mesh additionally shards the image height axis (high-res scaling beyond
one chip's HBM; conv halos become collective-permutes under SPMD --
see sharding.feature_sharding). A "model" axis is accepted as a
forward-compatible hook for tensor sharding but defaults to size 1.
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
