"""DenseNet121 encoder — keras-exact twin (native Flax).

Weight-layout and numerics twin of tf.keras.applications.DenseNet121 as
used by the reference (/root/reference/model/build_model/
pretrained_nets.py:46-49). Flat submodule names equal the keras layer
names (keras-2.4 "conv1/relu"-style slashes become underscores); taps
follow scaled_layers.json: conv1_relu (s2), pool2_conv (s4),
pool3_conv (s8), pool4_conv (s16), final relu (s32).

Keras-exact details: explicit (3,3) zero pad before the 7x7 stem conv
and (1,1) before the stride-2 max pool, transition 1x1 conv tapped
BEFORE its 2x2 average pool, BN eps 1.001e-5, all convs bias-free.

Input follows the pipeline convention ([-1, 1] floats fed straight into
keras preprocess_input, a reference quirk we reproduce): densenet
preprocessing is "torch" mode, (x/255 - mean)/std per channel.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_BN_EPS = 1.001e-5
_TORCH_MEAN = (0.485, 0.456, 0.406)
_TORCH_STD = (0.229, 0.224, 0.225)


class DenseNet121(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mean = jnp.asarray(_TORCH_MEAN, x.dtype)
        std = jnp.asarray(_TORCH_STD, x.dtype)
        x = ((x / 255.0 - mean) / std).astype(self.dtype)  # "torch" mode

        def conv(y, name, ch, kernel, stride=1, pad="VALID"):
            return nn.Conv(ch, (kernel, kernel), strides=(stride, stride),
                           padding=pad, use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)(y)

        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                epsilon=_BN_EPS, dtype=self.dtype,
                                param_dtype=jnp.float32, name=name)(y)

        def zpad(y, p):
            return jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)))

        x = conv(zpad(x, 3), "conv1_conv", 64, 7, stride=2)
        f2 = nn.relu(bn(x, "conv1_bn"))  # conv1_relu
        x = nn.max_pool(zpad(f2, 1), (3, 3), strides=(2, 2), padding="VALID")

        taps = [f2]
        for stage_idx, blocks in enumerate((6, 12, 24, 16)):
            sname = f"conv{stage_idx + 2}"
            for b in range(1, blocks + 1):
                p = f"{sname}_block{b}"
                y = nn.relu(bn(x, f"{p}_0_bn"))
                y = conv(y, f"{p}_1_conv", 128, 1)
                y = nn.relu(bn(y, f"{p}_1_bn"))
                y = conv(y, f"{p}_2_conv", 32, 3, pad="SAME")
                x = jnp.concatenate([x, y], axis=-1)
            if stage_idx < 3:  # transition pool{2,3,4}
                pname = f"pool{stage_idx + 2}"
                y = nn.relu(bn(x, f"{pname}_bn"))
                y = conv(y, f"{pname}_conv", x.shape[-1] // 2, 1)
                taps.append(y)  # tapped before the avg pool
                x = nn.avg_pool(y, (2, 2), strides=(2, 2))
            else:
                taps.append(nn.relu(bn(x, "bn")))  # final relu, stride 32
        return taps
