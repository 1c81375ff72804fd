"""DepthNet: U-Net depth predictors with multi-scale heads + depth chaining.

Re-designs /root/reference/model/build_model/depth_net.py as Flax modules.
Architecture contract (reference line refs in brackets):

- input is the 5-frame snippet [B, S, H, W, 3]; only the *target* frame
  (last) is used [depth_net.py:37,130];
- 4-scale outputs ``depth_ms = [d0 (1/1), d1 (1/2), d2 (1/4), d3 (1/8)]``;
- each scale's pre-activation conv is bilinearly upsampled and concatenated
  into the next finer decoder level ("depth chaining") [depth_net.py:58-64];
- decoder blocks: 2x upsample (nearest) -> conv -> concat(skip[, chained
  depth]) -> conv [depth_net.py:76-85];
- the final activation maps logits to metric depth (InverseSigmoid by
  default).

``DepthNetPretrained`` takes any backbone module producing 5 feature maps
at strides (2, 4, 8, 16, 32).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from xpt_mde_tpu.models.layers import (Conv, depth_to_space, packed_concat,
                                       resize_hw, resize_like, space_to_depth,
                                       upsample_2x)


class UpconvBlock(nn.Module):
    """2x upsample -> conv -> concat(skip[, chained depth]) -> conv
    (depth_net.py:76-85).

    ``packed=True`` evaluates the block in the space-to-depth domain
    (exact; see layers.PackedConv2D): ``x`` arrives unpacked at its
    pre-upsample resolution (= the packed grid), ``skip``/``bef_pred``
    arrive unpacked at 2x and are packed here; the nearest 2x upsample
    becomes a channel tile; the result is returned PACKED."""

    out_ch: int
    upsample_interp: str = "nearest"
    resize_to_skip: bool = False
    dtype: Any = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x, skip, bef_pred=None):
        if self.packed:
            assert not self.resize_to_skip and self.upsample_interp == "nearest"
            x = jnp.tile(x, (1, 1, 1, 4))  # packed nearest upsample
            x = Conv(self.out_ch, 3, dtype=self.dtype, packed=True)(x)
            parts = [x, space_to_depth(skip)] if bef_pred is None else \
                [x, space_to_depth(skip),
                 space_to_depth(bef_pred.astype(x.dtype))]
            x = packed_concat(parts)
            return Conv(self.out_ch, 3, dtype=self.dtype, packed=True)(x)
        x = upsample_2x(x, self.upsample_interp)
        x = Conv(self.out_ch, 3, dtype=self.dtype)(x)
        if self.resize_to_skip:
            x = resize_like(x, skip)
        parts = [x, skip] if bef_pred is None else [x, skip, bef_pred.astype(x.dtype)]
        x = jnp.concatenate(parts, axis=-1)
        return Conv(self.out_ch, 3, dtype=self.dtype)(x)


class ScaledDepthHead(nn.Module):
    """conv(1, 3, linear) -> activation -> depth; returns (depth, upsampled
    pre-activation conv, conv) for depth chaining (depth_net.py:87-91).

    ``packed=True`` takes a PACKED ``src`` and unpacks the 1-channel conv
    before the (elementwise) activation and chaining resize."""

    pred_activation: Callable
    dtype: Any = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, src, dst_h: int, dst_w: int):
        conv = Conv(1, 3, use_activation=False, dtype=self.dtype,
                    packed=self.packed)(src)
        if self.packed:
            conv = depth_to_space(conv)
        conv = conv.astype(jnp.float32)  # depth math stays f32
        depth = self.pred_activation(conv)
        conv_up = resize_hw(conv, dst_h, dst_w)
        return depth, conv_up, conv


class DepthDecoder(nn.Module):
    """Skip-connected decoder over 5 encoder features (strides 2..32) with
    4 chained depth heads (depth_net.py:137-167)."""

    pred_activation: Callable
    upsample_interp: str = "nearest"
    resize_to_skip: bool = False
    dtype: Any = jnp.float32
    packed_tail: bool = False  # space-to-depth fine scales (TPU perf)

    @nn.compact
    def __call__(self, features_ms, height: int, width: int):
        conv1, conv2, conv3, conv4, conv5 = features_ms
        # the packed tail works on the half-res grid of the half/full-res
        # blocks -> needs H, W divisible by 4 (all config shapes are /32)
        packed = (self.packed_tail and not self.resize_to_skip
                  and self.upsample_interp == "nearest"
                  and height % 4 == 0 and width % 4 == 0)

        def up(out_ch, packed=False):
            return UpconvBlock(out_ch, self.upsample_interp,
                               self.resize_to_skip, self.dtype, packed)

        def head(packed=False):
            return ScaledDepthHead(self.pred_activation, self.dtype, packed)

        upconv4 = up(256)(conv5, conv4)                                   # 1/16
        upconv3 = up(128)(upconv4, conv3)                                 # 1/8
        depth3, dp2_up, dp3 = head()(upconv3, height // 4, width // 4)
        upconv2 = up(64)(upconv3, conv2, dp2_up)                          # 1/4
        depth2, dp1_up, dp2 = head()(upconv2, height // 2, width // 2)
        if packed:
            # tiny-channel full-res convs are lane-starved on TPU (see
            # layers.PackedConv2D); run the 1/2- and 1/1-res blocks in
            # the space-to-depth domain -- exact, same param tree
            u3p = up(32, packed=True)(upconv2, conv1, dp1_up)             # 1/2
            depth1, dp0_up, dp1 = head(packed=True)(u3p, height, width)
            upconv1 = depth_to_space(u3p)
            u4p = up(16, packed=True)(upconv1,
                                      dp0_up.astype(self.dtype))          # 1/1
            depth0, _, dp0 = head(packed=True)(u4p, height, width)
            upconv0 = depth_to_space(u4p)
        else:
            upconv1 = up(32)(upconv2, conv1, dp1_up)                      # 1/2
            depth1, dp0_up, dp1 = head()(upconv1, height, width)
            upconv0 = up(16)(upconv1, dp0_up.astype(self.dtype))          # 1/1
            depth0, _, dp0 = head()(upconv0, height, width)

        return {"depth_ms": [depth0, depth1, depth2, depth3],
                "debug_out": [dp0, upconv0, dp3, upconv3]}


class BasicEncoder(nn.Module):
    """SfMLearner-style 7-level conv encoder (depth_net.py:39-52).

    Returns features at strides (2, 4, 8, 16, 32, 64, 128)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv0 = Conv(32, 7, 1, dtype=self.dtype)(x)
        conv1 = Conv(32, 7, 2, dtype=self.dtype)(conv0)
        conv1 = Conv(64, 5, 1, dtype=self.dtype)(conv1)
        conv2 = Conv(64, 5, 2, dtype=self.dtype)(conv1)
        conv2 = Conv(128, 3, 1, dtype=self.dtype)(conv2)
        conv3 = Conv(128, 3, 2, dtype=self.dtype)(conv2)
        conv3 = Conv(256, 3, 1, dtype=self.dtype)(conv3)
        conv4 = Conv(256, 3, 2, dtype=self.dtype)(conv3)
        conv4 = Conv(512, 3, 1, dtype=self.dtype)(conv4)
        conv5 = Conv(512, 3, 2, dtype=self.dtype)(conv4)
        conv5 = Conv(512, 3, 1, dtype=self.dtype)(conv5)
        conv6 = Conv(512, 3, 2, dtype=self.dtype)(conv5)
        conv6 = Conv(512, 3, 1, dtype=self.dtype)(conv6)
        conv7 = Conv(512, 3, 2, dtype=self.dtype)(conv6)
        return [conv1, conv2, conv3, conv4, conv5, conv6, conv7]


class DepthNetBasic(nn.Module):
    """Full SfMLearner-style U-Net: BasicEncoder 7 levels + two extra
    decoder levels + the shared decoder (depth_net.py:29-91)."""

    pred_activation: Callable
    upsample_interp: str = "nearest"
    resize_to_skip: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image5d, train: bool = False):
        target = image5d[:, -1]
        height, width = target.shape[1:3]
        feats = BasicEncoder(dtype=self.dtype)(target.astype(self.dtype))
        conv1, conv2, conv3, conv4, conv5, conv6, conv7 = feats

        up_args = dict(upsample_interp=self.upsample_interp,
                       resize_to_skip=self.resize_to_skip, dtype=self.dtype)
        upconv6 = UpconvBlock(512, **up_args)(conv7, conv6)   # 1/64
        upconv5 = UpconvBlock(512, **up_args)(upconv6, conv5)  # 1/32
        dec = DepthDecoder(self.pred_activation, self.upsample_interp,
                           self.resize_to_skip, self.dtype)
        return dec([conv1, conv2, conv3, conv4, upconv5], height, width)


class DepthNetNoResize(DepthNetBasic):
    """DepthNetBasic without decoder resize; input must be /128 divisible
    (depth_net.py:94-109)."""

    resize_to_skip: bool = False


class DepthNetPretrained(nn.Module):
    """U-Net over a multi-scale backbone encoder (depth_net.py:112-167)."""

    backbone: nn.Module
    pred_activation: Callable
    upsample_interp: str = "nearest"
    dtype: Any = jnp.float32
    packed_tail: bool = False

    @nn.compact
    def __call__(self, image5d, train: bool = False):
        target = image5d[:, -1]
        height, width = target.shape[1:3]
        features_ms = self.backbone(target.astype(self.dtype), train)
        assert len(features_ms) == 5, "backbone must emit 5 scales (2..32)"
        dec = DepthDecoder(self.pred_activation, self.upsample_interp,
                           resize_to_skip=False, dtype=self.dtype,
                           packed_tail=self.packed_tail)
        return dec(features_ms, height, width)
