"""MobileNetV2 encoder (native Flax).

Capability twin of keras MobileNetV2 used by the reference
(/root/reference/model/build_model/pretrained_nets.py:31-34). Emits 5
feature maps at strides (2, 4, 8, 16, 32).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# (expand_ratio, channels, repeats, stride)
_STAGES = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class InvertedResidual(nn.Module):
    out_ch: int
    expand_ratio: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        residual = x
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.999, epsilon=1e-3,
                                    dtype=self.dtype, param_dtype=jnp.float32)
        if self.expand_ratio != 1:
            x = nn.Conv(in_ch * self.expand_ratio, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.relu6(norm()(x))
        x = nn.Conv(x.shape[-1], (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", feature_group_count=x.shape[-1],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu6(norm()(x))
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = norm()(x)
        if self.stride == 1 and in_ch == self.out_ch:
            x = x + residual
        return x


class MobileNetV2(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu6(nn.BatchNorm(use_running_average=not train,
                                  momentum=0.999, epsilon=1e-3,
                                  dtype=self.dtype, param_dtype=jnp.float32)(x))
        taps = []
        for stage_idx, (expand, ch, reps, stride) in enumerate(_STAGES):
            for rep in range(reps):
                s = stride if rep == 0 else 1
                x = InvertedResidual(ch, expand, s, self.dtype)(x, train)
            # taps at strides 2, 4, 8, 16, 32 (stage ends 0, 1, 2, 4, 6)
            if stage_idx in (0, 1, 2, 4, 6):
                taps.append(x)
        return taps
