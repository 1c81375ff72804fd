"""NASNet-A encoder — keras-exact twin (native Flax).

Weight-layout and numerics twin of tf.keras.applications.NASNetMobile /
NASNetLarge as used by the reference (/root/reference/model/build_model/
pretrained_nets.py:36-44,87-96): preprocess_input ("tf" mode, x/127.5-1)
is applied to the [-1, 1] pipeline floats (a reference quirk we
reproduce), then the input is bilinearly resized to (H+2, W+2) so the
VALID 3x3 stride-2 stem conv lands the first tap exactly at H/2
(pretrained_nets.py:28-29,40-41).

Cell structure follows keras.src.applications.nasnet (Zoph et al.
NASNet-A, Fig. 4): `_separable_conv_block` = 2x [relu -> SeparableConv
-> BN(eps 1e-3)], `_adjust_block` (spatial: two offset avg-pool paths,
channel: 1x1 projection), 5-block normal / reduction cells.  Flat
submodule names equal the keras layer names; SeparableConv2D splits
into two bias-free convs named {name}_dw / {name}_pw (the layout
convert_keras.convert_keras_by_name emits).

Taps follow scaled_layers.json (the reference taps auto-numbered
Activation layers; structurally they are, in order):
  relu(stem_bn1)                     stride 2
  relu(adjusted p) in cell stem_2    stride 4
  relu(adjusted p) in cell reduce_N  stride 8
  relu(adjusted p) in cell reduce_2N stride 16
  relu(final normal concat)          stride 32
All relus of a given tensor are identical, so the per-sep-block relu
duplication in keras collapses to one tap here.

Variant 'Mobile': N=4 cells/stack, penultimate 1056, stem 32,
skip_reduction False.  'Large': N=6, penultimate 4032, stem 96,
skip_reduction True (p carries past reductions).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from xpt_mde_tpu.utils.image import resize_image


def _correct_pad(x, kernel: int):
    """keras imagenet_utils.correct_pad: explicit padding for a stride-2
    VALID conv/pool that matches SAME alignment on even inputs."""
    h, w = x.shape[-3], x.shape[-2]
    adjust = (1 - h % 2, 1 - w % 2)
    half = kernel // 2
    return ((half - adjust[0], half), (half - adjust[1], half))


class NASNet(nn.Module):
    """NASNet-A; variant 'Mobile' (N=4, penultimate 1056) or 'Large'
    (N=6, penultimate 4032). Emits 5 feature maps at strides 2..32 of
    the ORIGINAL input (the +2 resize cancels the VALID stem)."""

    variant: str = "Mobile"
    dtype: Any = jnp.float32

    def _conv(self, y, name, ch, kernel=1, stride=1, pad="SAME", groups=1):
        return nn.Conv(ch, (kernel, kernel), strides=(stride, stride),
                       padding=pad, use_bias=False,
                       feature_group_count=groups, dtype=self.dtype,
                       param_dtype=jnp.float32, name=name)(y)

    def _bn(self, y, name, train):
        return nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=name)(y)

    def _sep_block(self, ip, filters, kernel, strides, block_id, train):
        """keras `_separable_conv_block`: 2x [relu -> sepconv -> BN];
        the first conv may be strided (explicit correct_pad + VALID)."""
        x = nn.relu(ip)
        if strides == 2:
            x = jnp.pad(x, ((0, 0), *_correct_pad(x, kernel), (0, 0)))
            pad = "VALID"
        else:
            pad = "SAME"
        x = self._conv(x, f"separable_conv_1_{block_id}_dw", x.shape[-1],
                       kernel, strides, pad, groups=x.shape[-1])
        x = self._conv(x, f"separable_conv_1_{block_id}_pw", filters)
        x = self._bn(x, f"separable_conv_1_bn_{block_id}", train)
        x = nn.relu(x)
        x = self._conv(x, f"separable_conv_2_{block_id}_dw", x.shape[-1],
                       kernel, groups=x.shape[-1])
        x = self._conv(x, f"separable_conv_2_{block_id}_pw", filters)
        return self._bn(x, f"separable_conv_2_bn_{block_id}", train)

    def _adjust(self, p, ip, filters, block_id, train):
        """keras `_adjust_block`: match p to ip's spatial size / filter
        count (two offset stride-2 avg-pool paths, or 1x1 projection)."""
        if p is None:
            return ip
        if p.shape[-3] != ip.shape[-3]:
            p = nn.relu(p)
            p1 = p[:, ::2, ::2, :]
            p1 = self._conv(p1, f"adjust_conv_1_{block_id}", filters // 2)
            # zero-pad bottom/right, crop top/left: one-pixel shift
            p2 = jnp.pad(p, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1::2, 1::2]
            p2 = self._conv(p2, f"adjust_conv_2_{block_id}", filters // 2)
            p = jnp.concatenate([p1, p2], axis=-1)
            return self._bn(p, f"adjust_bn_{block_id}", train)
        if p.shape[-1] != filters:
            p = nn.relu(p)
            p = self._conv(p, f"adjust_conv_projection_{block_id}", filters)
            return self._bn(p, f"adjust_bn_{block_id}", train)
        return p

    def _normal_cell(self, ip, p, filters, block_id, train):
        p = self._adjust(p, ip, filters, block_id, train)
        h = nn.relu(ip)
        h = self._conv(h, f"normal_conv_1_{block_id}", filters)
        h = self._bn(h, f"normal_bn_1_{block_id}", train)

        def sep(y, kernel, bid):
            return self._sep_block(y, filters, kernel, 1, bid, train)

        def avg(y):  # keras SAME avg-pool excludes its implicit padding
            return nn.avg_pool(y, (3, 3), strides=(1, 1), padding="SAME",
                               count_include_pad=False)

        x1 = sep(h, 5, f"normal_left1_{block_id}") \
            + sep(p, 3, f"normal_right1_{block_id}")
        x2 = sep(p, 5, f"normal_left2_{block_id}") \
            + sep(p, 3, f"normal_right2_{block_id}")
        x3 = avg(h) + p
        x4 = avg(p) + avg(p)
        x5 = sep(h, 3, f"normal_left5_{block_id}") + h
        return jnp.concatenate([p, x1, x2, x3, x4, x5], axis=-1), ip

    def _reduction_cell(self, ip, p, filters, block_id, train):
        """Returns (out, new_p, tap) where tap = relu(adjusted p) — the
        Activation layer the reference taps (scaled_layers.json)."""
        p = self._adjust(p, ip, filters, block_id, train)
        tap = nn.relu(p)
        h = nn.relu(ip)
        h = self._conv(h, f"reduction_conv_1_{block_id}", filters)
        h = self._bn(h, f"reduction_bn_1_{block_id}", train)
        # explicit zero-pad shared by the VALID stride-2 pools
        h3 = jnp.pad(h, ((0, 0), *_correct_pad(h, 3), (0, 0)))

        def sep(y, kernel, stride, bid):
            return self._sep_block(y, filters, kernel, stride, bid, train)

        x1 = sep(h, 5, 2, f"reduction_left1_{block_id}") \
            + sep(p, 7, 2, f"reduction_right1_{block_id}")
        x2 = nn.max_pool(h3, (3, 3), strides=(2, 2), padding="VALID") \
            + sep(p, 7, 2, f"reduction_right2_{block_id}")
        # explicit pad zeros are data for the VALID avg-pool (keras
        # semantics: only implicit SAME padding is excluded)
        x3 = nn.avg_pool(h3, (3, 3), strides=(2, 2), padding="VALID") \
            + sep(p, 5, 2, f"reduction_right3_{block_id}")
        x4 = nn.avg_pool(x1, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False) + x2
        # keras reuses block_id reduction_left4 for this sep block
        x5 = sep(x1, 3, 1, f"reduction_left4_{block_id}") \
            + nn.max_pool(h3, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([x2, x3, x4, x5], axis=-1), ip, tap

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.variant == "Mobile":
            repeats, penultimate, stem_filters, skip_red = 4, 1056, 32, False
        else:
            repeats, penultimate, stem_filters, skip_red = 6, 4032, 96, True
        filters = penultimate // 24  # filter_multiplier = 2

        x = x / 127.5 - 1.0  # keras "tf"-mode preprocess, on [-1,1] floats
        height, width = x.shape[-3], x.shape[-2]
        x = resize_image(x, height + 2, width + 2)  # pretrained_nets.py:40
        x = x.astype(self.dtype)

        x = self._conv(x, "stem_conv1", stem_filters, 3, 2, "VALID")
        x = self._bn(x, "stem_bn1", train)

        taps = []
        x, p, tap = self._reduction_cell(x, None, filters // 4, "stem_1",
                                         train)
        taps.append(tap)  # relu(stem_bn1), stride 2
        x, p, tap = self._reduction_cell(x, p, filters // 2, "stem_2", train)
        taps.append(tap)  # stride 4

        for i in range(repeats):
            x, p = self._normal_cell(x, p, filters, f"{i}", train)
        x, p0, tap = self._reduction_cell(x, p, filters * 2,
                                          f"reduce_{repeats}", train)
        taps.append(tap)  # stride 8
        p = p0 if not skip_red else p

        for i in range(repeats):
            x, p = self._normal_cell(x, p, filters * 2,
                                     f"{repeats + i + 1}", train)
        x, p0, tap = self._reduction_cell(x, p, filters * 4,
                                          f"reduce_{2 * repeats}", train)
        taps.append(tap)  # stride 16
        p = p0 if not skip_red else p

        for i in range(repeats):
            x, p = self._normal_cell(x, p, filters * 4,
                                     f"{2 * repeats + i + 1}", train)
        taps.append(nn.relu(x))  # stride 32
        return taps
