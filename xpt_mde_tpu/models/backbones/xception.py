"""Xception encoder — keras-exact twin (native Flax).

Weight-layout and numerics twin of tf.keras.applications.Xception as
used by the reference (/root/reference/model/build_model/
pretrained_nets.py:56-65): the input is bilinearly resized to
(H+6, W+6) so the two VALID stem convs land the taps exactly at
strides 2..32. Flat submodule names equal the keras layer names; the
keras auto-named residual convs/BNs (conv2d, conv2d_1, ...,
batch_normalization, ...) are named xres_conv_{i}/xres_bn_{i} here and
remapped by encounter order in the converter. Taps follow
scaled_layers.json: block2_sepconv2_bn (s2), block3_sepconv2_bn (s4),
block4_sepconv2_bn (s8), block13_sepconv2_bn (s16),
block14_sepconv2_act (s32).

SeparableConv2D splits into two bias-free Flax convs named
{name}_dw / {name}_pw. BN eps 1e-3. block2 has no relu before its
first sepconv.

Input follows the pipeline convention ([-1, 1] floats fed straight into
keras preprocess_input, a reference quirk we reproduce): xception
preprocessing is "tf" mode, x/127.5 - 1, applied BEFORE the resize as
the reference's Lambda does.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from xpt_mde_tpu.utils.image import resize_image


class Xception(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x / 127.5 - 1.0  # keras "tf"-mode preprocess
        height, width = x.shape[-3], x.shape[-2]
        x = resize_image(x, height + 6, width + 6)  # pretrained_nets.py:58-65
        x = x.astype(self.dtype)

        def conv(y, name, ch, kernel=1, stride=1, pad="SAME", groups=1):
            return nn.Conv(ch, (kernel, kernel), strides=(stride, stride),
                           padding=pad, use_bias=False,
                           feature_group_count=groups, dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)(y)

        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=name)(y)

        def sepconv(y, name, ch):
            y = conv(y, f"{name}_dw", y.shape[-1], 3, groups=y.shape[-1])
            return conv(y, f"{name}_pw", ch)

        def pool(y):
            return nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")

        # stem: two VALID convs
        x = conv(x, "block1_conv1", 32, 3, 2, "VALID")
        x = nn.relu(bn(x, "block1_conv1_bn"))
        x = conv(x, "block1_conv2", 64, 3, 1, "VALID")
        x = nn.relu(bn(x, "block1_conv2_bn"))

        taps = []
        xres = 0  # keras auto-name counter (conv2d/batch_normalization_i)

        def entry_block(y, block, sep1_ch, sep2_ch, relu_first=True):
            nonlocal xres
            residual = bn(conv(y, f"xres_conv_{xres}", sep2_ch, 1, 2),
                          f"xres_bn_{xres}")
            xres += 1
            if relu_first:
                y = nn.relu(y)
            y = bn(sepconv(y, f"block{block}_sepconv1", sep1_ch),
                   f"block{block}_sepconv1_bn")
            y = nn.relu(y)
            tap = bn(sepconv(y, f"block{block}_sepconv2", sep2_ch),
                     f"block{block}_sepconv2_bn")
            return pool(tap) + residual, tap

        x, tap = entry_block(x, 2, 128, 128, relu_first=False)
        taps.append(tap)                                   # stride 2
        x, tap = entry_block(x, 3, 256, 256)
        taps.append(tap)                                   # stride 4
        x, tap = entry_block(x, 4, 728, 728)
        taps.append(tap)                                   # stride 8

        for block in range(5, 13):  # middle flow
            y = x
            for s in (1, 2, 3):
                y = nn.relu(y)
                y = bn(sepconv(y, f"block{block}_sepconv{s}", 728),
                       f"block{block}_sepconv{s}_bn")
            x = x + y

        x, tap = entry_block(x, 13, 728, 1024)
        taps.append(tap)                                   # stride 16

        x = nn.relu(bn(sepconv(x, "block14_sepconv1", 1536),
                       "block14_sepconv1_bn"))
        x = nn.relu(bn(sepconv(x, "block14_sepconv2", 2048),
                       "block14_sepconv2_bn"))
        taps.append(x)                                     # stride 32
        return taps
