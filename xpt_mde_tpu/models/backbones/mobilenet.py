"""MobileNetV2 encoder — keras-exact twin (native Flax).

Weight-layout and numerics twin of tf.keras.applications.MobileNetV2
(alpha=1.0) as used by the reference (/root/reference/model/build_model/
pretrained_nets.py:31-34). Flat submodule names equal the keras layer
names; taps follow scaled_layers.json: block_1_expand_relu (s2),
block_3_expand_relu (s4), block_6_expand_relu (s8),
block_13_expand_relu (s16), out_relu (s32).

Keras-exact details: explicit ((0,1),(0,1)) zero pad + VALID conv on
the stride-2 depthwise convs (keras correct_pad), relu6 activations,
BN eps 1e-3 / momentum 0.999, residual adds only on stride-1 blocks
with matching channels.

Input follows the pipeline convention ([-1, 1] floats fed straight into
keras preprocess_input, a reference quirk we reproduce): mobilenet_v2
preprocessing is "tf" mode, x/127.5 - 1.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# (out_ch, stride) per block_1..block_16; expansion is 6x input channels
_BLOCKS = [(24, 2), (24, 1), (32, 2), (32, 1), (32, 1), (64, 2), (64, 1),
           (64, 1), (64, 1), (96, 1), (96, 1), (96, 1), (160, 2), (160, 1),
           (160, 1), (320, 1)]
_TAP_BLOCKS = (1, 3, 6, 13)


class MobileNetV2(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = (x / 127.5 - 1.0).astype(self.dtype)  # keras "tf"-mode preprocess

        def conv(y, name, ch, kernel=1, stride=1, pad="SAME", groups=1):
            return nn.Conv(ch, (kernel, kernel), strides=(stride, stride),
                           padding=pad, use_bias=False,
                           feature_group_count=groups, dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)(y)

        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                                momentum=0.999, dtype=self.dtype,
                                param_dtype=jnp.float32, name=name)(y)

        def depthwise(y, name, stride):
            if stride == 2:  # keras correct_pad: ((0,1),(0,1)) + VALID
                y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
                return conv(y, name, y.shape[-1], 3, 2, "VALID", y.shape[-1])
            return conv(y, name, y.shape[-1], 3, 1, "SAME", y.shape[-1])

        x = conv(x, "Conv1", 32, 3, 2)
        x = nn.relu6(bn(x, "bn_Conv1"))  # Conv1_relu

        # expanded_conv: the expansion-1 first block
        x = nn.relu6(bn(depthwise(x, "expanded_conv_depthwise", 1),
                        "expanded_conv_depthwise_BN"))
        x = bn(conv(x, "expanded_conv_project", 16),
               "expanded_conv_project_BN")

        taps = []
        for i, (out_ch, stride) in enumerate(_BLOCKS, start=1):
            p = f"block_{i}"
            in_ch = x.shape[-1]
            y = nn.relu6(bn(conv(x, f"{p}_expand", in_ch * 6),
                            f"{p}_expand_BN"))  # block_i_expand_relu
            if i in _TAP_BLOCKS:
                taps.append(y)
            y = nn.relu6(bn(depthwise(y, f"{p}_depthwise", stride),
                            f"{p}_depthwise_BN"))
            y = bn(conv(y, f"{p}_project", out_ch), f"{p}_project_BN")
            x = x + y if (stride == 1 and in_ch == out_ch) else y

        x = nn.relu6(bn(conv(x, "Conv_1", 1280), "Conv_1_bn"))  # out_relu
        taps.append(x)
        return taps
