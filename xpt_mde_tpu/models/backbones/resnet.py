"""ResNet50V2 encoder — keras-exact twin (native Flax).

Weight-layout and numerics twin of tf.keras.applications.ResNet50V2 as
used by the reference (/root/reference/model/build_model/
pretrained_nets.py:98-101), so converted ImageNet weights reproduce
keras feature maps exactly. Flat submodule names equal the keras layer
names; tap points follow scaled_layers.json: conv1_conv (s2),
conv2_block3_1_relu (s4), conv3_block4_1_relu (s8),
conv4_block6_1_relu (s16), post_relu (s32).

Keras-exact details preserved: explicit zero padding before the 7x7
stem conv and the strided 3x3 convs (NOT XLA SAME, which pads
asymmetrically), 1x1-maxpool shortcut (= strided slice) on strided
blocks, conv shortcut only on each stage's first block, bias on the
1x1 projection convs, BN eps 1.001e-5.

Input follows the pipeline convention (the reference feeds its [-1, 1]
float images straight into keras preprocess_input — a quirk we
reproduce): resnet_v2 preprocessing is "tf" mode, x/127.5 - 1.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_BN_EPS = 1.001e-5


class ResNet50V2(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = (x / 127.5 - 1.0).astype(self.dtype)  # keras "tf"-mode preprocess

        def conv(y, name, ch, kernel, stride=1, bias=True, pad="VALID"):
            return nn.Conv(ch, (kernel, kernel), strides=(stride, stride),
                           padding=pad, use_bias=bias, dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)(y)

        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                epsilon=_BN_EPS, dtype=self.dtype,
                                param_dtype=jnp.float32, name=name)(y)

        def zpad(y, p):
            return jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)))

        x = conv(zpad(x, 3), "conv1_conv", 64, 7, stride=2)
        f2 = x
        x = nn.max_pool(zpad(x, 1), (3, 3), strides=(2, 2), padding="VALID")

        taps = [f2]
        stages = [("conv2", 64, 3), ("conv3", 128, 4), ("conv4", 256, 6),
                  ("conv5", 512, 3)]
        for stage_idx, (sname, ch, blocks) in enumerate(stages):
            for b in range(1, blocks + 1):
                p = f"{sname}_block{b}"
                stride = 2 if (b == blocks and stage_idx < 3) else 1
                preact = nn.relu(bn(x, f"{p}_preact_bn"))
                if b == 1:
                    shortcut = conv(preact, f"{p}_0_conv", ch * 4, 1,
                                    stride=stride)
                elif stride > 1:
                    shortcut = x[:, ::stride, ::stride, :]  # 1x1 max pool
                else:
                    shortcut = x
                y = nn.relu(bn(conv(preact, f"{p}_1_conv", ch, 1, bias=False),
                               f"{p}_1_bn"))
                if b == blocks and stage_idx < 3:
                    taps.append(y)  # conv{2,3,4}_block{last}_1_relu
                y = conv(zpad(y, 1), f"{p}_2_conv", ch, 3, stride=stride,
                         bias=False)
                y = nn.relu(bn(y, f"{p}_2_bn"))
                y = conv(y, f"{p}_3_conv", ch * 4, 1)
                x = shortcut + y
        taps.append(nn.relu(bn(x, "post_bn")))  # post_relu, stride 32
        return taps
