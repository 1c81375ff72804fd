"""ResNet50V2 encoder (pre-activation ResNet, native Flax).

Capability twin of keras ResNet50V2 used by the reference
(/root/reference/model/build_model/pretrained_nets.py:98-101). Emits 5
feature maps at strides (2, 4, 8, 16, 32).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PreActBottleneck(nn.Module):
    ch: int  # bottleneck width; output is 4*ch
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, param_dtype=jnp.float32)
        preact = nn.relu(norm()(x))
        if self.stride != 1 or x.shape[-1] != self.ch * 4:
            shortcut = nn.Conv(self.ch * 4, (1, 1), strides=(self.stride,) * 2,
                               dtype=self.dtype, param_dtype=jnp.float32)(preact)
        else:
            shortcut = x
        y = nn.Conv(self.ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(preact)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.ch, (3, 3), strides=(self.stride,) * 2, padding="SAME",
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.ch * 4, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        return shortcut + y


class ResNet50V2(nn.Module):
    """Stages (3, 4, 6, 3) with v2 stride placement. Taps: stem conv (s2),
    ends of stages at strides 4, 8, 16, 32."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        f2 = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        taps = [f2]
        # v2 places the downsampling stride on the *last* block of a stage,
        # so the (4, 8, 16) taps are taken just before that striding block
        for stage, (ch, blocks) in enumerate([(64, 3), (128, 4), (256, 6), (512, 3)]):
            for _ in range(blocks - 1):
                x = PreActBottleneck(ch, 1, self.dtype)(x, train)
            if stage < 3:
                taps.append(x)  # strides 4, 8, 16
                x = PreActBottleneck(ch, 2, self.dtype)(x, train)
            else:
                x = PreActBottleneck(ch, 1, self.dtype)(x, train)
                x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                         dtype=self.dtype,
                                         param_dtype=jnp.float32)(x))
                taps.append(x)  # stride 32
        return taps
