"""NASNet-A encoder (native Flax re-implementation of the cell search
result).

Capability twin of keras NASNetMobile / NASNetLarge used by the
reference (/root/reference/model/build_model/pretrained_nets.py:36-44,
87-96). Implements the NASNet-A normal/reduction cells (Zoph et al.,
CVPR 2018): five two-op blocks over the current and previous cell
outputs, concatenated. The keras odd-input padding workaround
(pretrained_nets.py:28-29) is unnecessary -- SAME padding handles /32
inputs.

Emits 5 feature maps at strides (2, 4, 8, 16, 32).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SepConv(nn.Module):
    """relu -> sepconv -> bn, twice (NASNet separable stack)."""

    features: int
    kernel: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, stride in enumerate((self.strides, 1)):
            x = nn.relu(x)
            x = nn.Conv(x.shape[-1], (self.kernel, self.kernel),
                        strides=(stride, stride), padding="SAME",
                        feature_group_count=x.shape[-1], use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
        return x


class Squeeze(nn.Module):
    """relu -> 1x1 conv -> bn input adjustment."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), strides=(self.strides,) * 2,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        return nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


def _pool(x, kind: str, strides: int):
    fn = nn.avg_pool if kind == "avg" else nn.max_pool
    return fn(x, (3, 3), strides=(strides, strides), padding="SAME")


class NormalCell(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, prev, cur, train: bool = False):
        h_prev = Squeeze(self.features, dtype=self.dtype)(prev, train)
        if h_prev.shape[-3:-1] != cur.shape[-3:-1]:
            h_prev = _pool(h_prev, "avg", 2)
        h = Squeeze(self.features, dtype=self.dtype)(cur, train)
        sep = lambda k: SepConv(self.features, k, dtype=self.dtype)
        b1 = sep(3)(h, train) + h
        b2 = sep(3)(h_prev, train) + sep(5)(h, train)
        b3 = _pool(h, "avg", 1) + h_prev
        b4 = _pool(h_prev, "avg", 1) + _pool(h_prev, "avg", 1)
        b5 = sep(5)(h_prev, train) + sep(3)(h_prev, train)
        return jnp.concatenate([h_prev, b1, b2, b3, b4, b5], axis=-1)


class ReductionCell(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, prev, cur, train: bool = False):
        h_prev = Squeeze(self.features, dtype=self.dtype)(prev, train)
        if h_prev.shape[-3] != cur.shape[-3]:
            h_prev = _pool(h_prev, "avg", 2)
        h = Squeeze(self.features, dtype=self.dtype)(cur, train)
        sep = lambda k, s=2: SepConv(self.features, k, s, dtype=self.dtype)
        b1 = sep(5)(h_prev, train) + sep(7)(h, train)
        b2 = _pool(h, "max", 2) + sep(7)(h_prev, train)
        b3 = _pool(h, "avg", 2) + sep(5)(h_prev, train)
        b4 = _pool(b1, "avg", 1) + b2
        b5 = SepConv(self.features, 3, 1, dtype=self.dtype)(b1, train) \
            + _pool(h, "max", 2)
        return jnp.concatenate([b1, b2, b3, b4, b5], axis=-1)


class NASNet(nn.Module):
    """NASNet-A; variant 'Mobile' (N=4, penultimate 1056) or 'Large'
    (N=6, penultimate 4032)."""

    variant: str = "Mobile"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.variant == "Mobile":
            repeats, penultimate = 4, 1056
        else:
            repeats, penultimate = 6, 4032
        # filters per cell derived from the penultimate count:
        # penultimate = 24 * filters_mult -> base filters
        filters = penultimate // 24

        x = nn.Conv(32 if self.variant == "Mobile" else 96, (3, 3),
                    strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        stem = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)  # stride 2
        taps = [stem]

        # two stem reduction cells: stride 4, then 8
        prev, cur = stem, ReductionCell(filters // 4,
                                        dtype=self.dtype)(stem, stem, train)
        taps.append(cur)  # stride 4
        prev, cur = cur, ReductionCell(filters // 2,
                                       dtype=self.dtype)(prev, cur, train)
        taps.append(cur)  # stride 8

        # 3 stacks of N normal cells with reductions between
        for stack, mult in enumerate((1, 2, 4)):
            for _ in range(repeats):
                prev, cur = cur, NormalCell(filters * mult,
                                            dtype=self.dtype)(prev, cur, train)
            if stack < 2:
                taps.append(cur)  # strides 8->16 handled below
                prev, cur = cur, ReductionCell(filters * mult * 2,
                                               dtype=self.dtype)(prev, cur,
                                                                 train)
        taps.append(cur)  # stride 32
        # taps collected: [s2, s4, s8, s8(normal), s16(normal), s32]
        # keep strides (2, 4, 8, 16, 32): drop the duplicate s8 entry
        return [taps[0], taps[1], taps[3], taps[4], taps[5]]
