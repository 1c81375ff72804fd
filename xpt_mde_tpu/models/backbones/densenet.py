"""DenseNet121 encoder (native Flax).

Capability twin of keras DenseNet121 used by the reference
(/root/reference/model/build_model/pretrained_nets.py:46-49). Emits 5
feature maps at strides (2, 4, 8, 16, 32): stem conv, then the ends of
the four dense blocks.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class DenseLayer(nn.Module):
    growth: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    epsilon=1.001e-5, dtype=self.dtype,
                                    param_dtype=jnp.float32)
        y = nn.relu(norm()(x))
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.growth, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 epsilon=1.001e-5, dtype=self.dtype,
                                 param_dtype=jnp.float32)(x))
        y = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        return nn.avg_pool(y, (2, 2), strides=(2, 2))


class DenseNet121(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    epsilon=1.001e-5, dtype=self.dtype,
                                    param_dtype=jnp.float32)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        f2 = nn.relu(norm()(x))
        x = nn.max_pool(f2, (3, 3), strides=(2, 2), padding="SAME")

        taps = [f2]
        for stage, blocks in enumerate((6, 12, 24, 16)):
            for _ in range(blocks):
                x = DenseLayer(dtype=self.dtype)(x, train)
            taps.append(x)  # strides 4, 8, 16, 32
            if stage < 3:
                x = Transition(dtype=self.dtype)(x, train)
        return taps
