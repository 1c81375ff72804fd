"""VGG16 encoder (native Flax).

Capability twin of keras VGG16 used by the reference
(/root/reference/model/build_model/pretrained_nets.py:51-54). Emits 5
feature maps at strides (2, 4, 8, 16, 32): the conv outputs just after
each max-pool level.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class VGG16(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(y, ch):
            y = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32)(y)
            return nn.relu(y)

        def pool(y):
            return nn.max_pool(y, (2, 2), strides=(2, 2))

        taps = []
        x = conv(conv(x, 64), 64)
        x = pool(x)                       # stride 2
        taps.append(x)
        x = conv(conv(x, 128), 128)
        x = pool(x)                       # stride 4
        taps.append(x)
        x = conv(conv(conv(x, 256), 256), 256)
        x = pool(x)                       # stride 8
        taps.append(x)
        x = conv(conv(conv(x, 512), 512), 512)
        x = pool(x)                       # stride 16
        taps.append(x)
        x = conv(conv(conv(x, 512), 512), 512)
        x = pool(x)                       # stride 32
        taps.append(x)
        return taps
