"""Xception encoder (native Flax).

Capability twin of keras Xception used by the reference
(/root/reference/model/build_model/pretrained_nets.py:56-65; the keras
odd-input padding workaround is unnecessary here -- SAME padding handles
any /32-divisible input). Emits 5 feature maps at strides (2, 4, 8, 16, 32).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SeparableConv(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                    feature_group_count=x.shape[-1], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


class XceptionBlock(nn.Module):
    features: int
    strides: int = 2
    relu_first: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, param_dtype=jnp.float32)
        residual = nn.Conv(self.features, (1, 1), strides=(self.strides,) * 2,
                           use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32)(x)
        residual = norm()(residual)
        y = x
        for i in range(2):
            if self.relu_first or i > 0:
                y = nn.relu(y)
            y = SeparableConv(self.features, self.dtype)(y)
            y = norm()(y)
        if self.strides > 1:
            y = nn.max_pool(y, (3, 3), strides=(self.strides,) * 2,
                            padding="SAME")
        return y + residual


class MiddleBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, param_dtype=jnp.float32)
        y = x
        for _ in range(3):
            y = nn.relu(y)
            y = SeparableConv(728, self.dtype)(y)
            y = norm()(y)
        return x + y


class Xception(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, param_dtype=jnp.float32)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.relu(norm()(x))
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        f2 = nn.relu(norm()(x))                               # stride 2

        f4 = XceptionBlock(128, 2, relu_first=False,
                           dtype=self.dtype)(f2, train)        # stride 4
        f8 = XceptionBlock(256, 2, dtype=self.dtype)(f4, train)   # stride 8
        x = XceptionBlock(728, 2, dtype=self.dtype)(f8, train)    # stride 16
        for _ in range(8):
            x = MiddleBlock(dtype=self.dtype)(x, train)
        f16 = x
        x = XceptionBlock(1024, 2, dtype=self.dtype)(f16, train)  # stride 32
        x = SeparableConv(1536, self.dtype)(x)
        x = nn.relu(norm()(x))
        x = SeparableConv(2048, self.dtype)(x)
        f32 = nn.relu(norm()(x))
        return [f2, f4, f8, f16, f32]
