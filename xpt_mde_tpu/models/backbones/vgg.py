"""VGG16 encoder — keras-exact twin (native Flax).

Weight-layout and numerics twin of tf.keras.applications.VGG16 as used
by the reference (/root/reference/model/build_model/
pretrained_nets.py:51-54). Flat submodule names equal the keras layer
names; taps follow scaled_layers.json: block2_conv2 (s2),
block3_conv3 (s4), block4_conv3 (s8), block5_conv3 (s16),
block5_pool (s32). All convs 3x3 SAME with bias + relu.

Input follows the pipeline convention ([-1, 1] floats fed straight into
keras preprocess_input, a reference quirk we reproduce): vgg16
preprocessing is "caffe" mode — RGB->BGR then per-channel ImageNet mean
subtraction, no scaling.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_CAFFE_MEAN_BGR = (103.939, 116.779, 123.68)
_STAGES = [("block1", 64, 2), ("block2", 128, 2), ("block3", 256, 3),
           ("block4", 512, 3), ("block5", 512, 3)]


class VGG16(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[..., ::-1] - jnp.asarray(_CAFFE_MEAN_BGR, x.dtype)  # "caffe"
        x = x.astype(self.dtype)

        taps = []
        for stage_idx, (sname, ch, convs) in enumerate(_STAGES):
            for c in range(1, convs + 1):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"{sname}_conv{c}")(x)
                x = nn.relu(x)
            if stage_idx >= 1:
                taps.append(x)  # block{2..5}_conv{last} at strides 2..16
            x = nn.max_pool(x, (2, 2), strides=(2, 2))  # block{i}_pool
        taps.append(x)  # block5_pool, stride 32
        return taps
