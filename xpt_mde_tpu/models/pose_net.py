"""PoseNet: 6-DoF ego-motion predictors.

Re-designs /root/reference/model/build_model/pose_net.py as Flax modules.
Contract: input [B, S, H, W, 3] snippet, frames stacked on channels
[pose_net.py:44-50]; conv stack -> 1x1 conv to numsrc*6 -> global average
pool -> [B, numsrc, 6] twists that transform target-frame points into each
source frame.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from xpt_mde_tpu.models.layers import Conv, restack_on_channels


class PoseNetBasic(nn.Module):
    """7 stride-2 convs (pose_net.py:16-33)."""

    high_res: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image5d, train: bool = False):
        numsrc = image5d.shape[1] - 1
        x = restack_on_channels(image5d).astype(self.dtype)
        x = Conv(16, 7, 2, dtype=self.dtype)(x)
        x = Conv(32, 5, 2, dtype=self.dtype)(x)
        x = Conv(64, 3, 2, dtype=self.dtype)(x)
        x = Conv(128, 3, 2, dtype=self.dtype)(x)
        x = Conv(256, 3, 2, dtype=self.dtype)(x)
        x = Conv(256, 3, 2, dtype=self.dtype)(x)
        x = Conv(256, 3, 2, dtype=self.dtype)(x)
        poses = Conv(numsrc * 6, 1, use_activation=False, dtype=self.dtype)(x)
        poses = jnp.mean(poses.astype(jnp.float32), axis=(1, 2))
        return {"pose": poses.reshape(-1, numsrc, 6)}


class PoseNetImproved(nn.Module):
    """The production variant (pose_net.py:57-91): 6 stride-2 levels with a
    3-conv tail; one extra stride-2 block at high resolution."""

    high_res: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image5d, train: bool = False):
        numsrc = image5d.shape[1] - 1
        x = restack_on_channels(image5d).astype(self.dtype)
        x = Conv(32, 5, 2, dtype=self.dtype)(x)
        x = Conv(32, 5, 2, dtype=self.dtype)(x)
        x = Conv(64, 3, 2, dtype=self.dtype)(x)
        x = Conv(128, 3, 2, dtype=self.dtype)(x)
        x = Conv(256, 3, 2, dtype=self.dtype)(x)
        x = Conv(256, 3, 2, dtype=self.dtype)(x)
        x = Conv(256, 3, dtype=self.dtype)(x)
        x = Conv(256, 3, dtype=self.dtype)(x)
        if self.high_res:  # pose_net.py:80-84
            x = Conv(512, 3, 2, dtype=self.dtype)(x)
            x = Conv(512, 3, dtype=self.dtype)(x)
            x = Conv(512, 3, dtype=self.dtype)(x)
        poses = Conv(numsrc * 6, 1, use_activation=False, dtype=self.dtype)(x)
        poses = jnp.mean(poses.astype(jnp.float32), axis=(1, 2))
        return {"pose": poses.reshape(-1, numsrc, 6)}


class PoseNetDeep(nn.Module):
    """Deeper max-pool variant (pose_net.py:94-133)."""

    high_res: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image5d, train: bool = False):
        numsrc = image5d.shape[1] - 1
        x = restack_on_channels(image5d).astype(self.dtype)

        def pool(y):
            return nn.max_pool(y, (2, 2), strides=(2, 2))

        x = Conv(32, 5, dtype=self.dtype)(x)
        # block 1 (vo_conv1_*) is two 3x3 convs with NO 1x1 bottleneck;
        # blocks 2-6 are 3x3 -> 1x1(C/2) -> 3x3 (pose_net.py:103-130)
        x = pool(x)
        x = Conv(32, 3, dtype=self.dtype)(x)
        x = Conv(32, 3, dtype=self.dtype)(x)
        for chans in (64, 64, 128, 256, 256):
            x = pool(x)
            x = Conv(chans, 3, dtype=self.dtype)(x)
            x = Conv(chans // 2, 1, dtype=self.dtype)(x)
            x = Conv(chans, 3, dtype=self.dtype)(x)
        if self.high_res:
            x = Conv(512, 3, 2, dtype=self.dtype)(x)
            x = Conv(512, 3, dtype=self.dtype)(x)
            x = Conv(512, 3, dtype=self.dtype)(x)
        poses = Conv(numsrc * 6, 1, use_activation=False, dtype=self.dtype)(x)
        poses = jnp.mean(poses.astype(jnp.float32), axis=(1, 2))
        return {"pose": poses.reshape(-1, numsrc, 6)}


class PoseNetPreTrained(nn.Module):
    """Backbone-encoded pose net (pose_net.py:136-155): a multi-scale
    backbone consumes the channel-stacked snippet, then the Improved
    tail predicts the twists."""

    backbone: nn.Module
    high_res: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image5d, train: bool = False):
        numsrc = image5d.shape[1] - 1
        x = restack_on_channels(image5d).astype(self.dtype)
        feats = self.backbone(x, train)
        x = feats[-1]  # stride-32 features
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = Conv(256, 3, dtype=self.dtype)(x)
        x = Conv(128, 1, dtype=self.dtype)(x)
        x = Conv(256, 3, dtype=self.dtype)(x)
        if self.high_res:
            x = Conv(512, 3, 2, dtype=self.dtype)(x)
            x = Conv(512, 3, dtype=self.dtype)(x)
            x = Conv(512, 3, dtype=self.dtype)(x)
        poses = Conv(numsrc * 6, 1, use_activation=False, dtype=self.dtype)(x)
        poses = jnp.mean(poses.astype(jnp.float32), axis=(1, 2))
        return {"pose": poses.reshape(-1, numsrc, 6)}
