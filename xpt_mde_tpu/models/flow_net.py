"""PWC-Net optical flow (TPU-native Flax).

Re-designs /root/reference/model/build_model/flow_net.py. Architecture
contract (reference line refs):

- siamese 6-level encoder on the target and the batch-flattened sources
  [flow_net.py:65-84];
- coarse-to-fine: correlation cost volume at each level with
  md = 128 / 2^p and displacement-grid stride max(md//4, 1)
  [flow_net.py:159-174] -- the CUDA CorrelationCost op becomes
  ops/correlation.correlation_cost;
- warp right features by the upsampled flow scaled by
  (0.625, 1.25, 2.5, 5.0) at levels 5..2 [flow_net.py:38-41] -- the CUDA
  dense_image_warp becomes ops/flow_warp.flow_bilinear_sample;
- DenseNet-style flow predictor + transposed-conv upsampling
  [flow_net.py:127-147]; dilated context refinement at the finest level
  [flow_net.py:149-157].

Output: {"flow_ms": [f2 (1/4), f3 (1/8), f4 (1/16), f5 (1/32)]}, each
[batch, numsrc, H/2^p, W/2^p, 2] with (u, v) flow matching the
loss-side warp convention (grid - flow).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from xpt_mde_tpu.models.layers import Conv, depth_to_space, space_to_depth
from xpt_mde_tpu.ops.correlation import correlation_cost
from xpt_mde_tpu.ops.flow_warp import flow_bilinear_sample

MAX_DISPLACEMENT = 128


class PWCEncoder(nn.Module):
    """Siamese 6-level pyramid (flow_net.py:65-84).

    ``packed=True`` evaluates levels 1-2 in the space-to-depth domain:
    their C=16/32 feature maps are lane-starved on TPU (channels pad to
    128 lanes) and the packed lift (layers.pack_conv_kernel[_s2], exact
    same multiply-adds and param tree) measured 1.8-2x faster fwd+bwd
    at every bench shape (benchmarks/probe_packed_pwc.py). Level-1
    features are returned PACKED ([H/4, W/4, 64]) -- no consumer reads
    them unpacked (PWCNet uses feats[1:]); level 2 unpacks for the
    correlation volume."""

    dtype: Any = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        feats = []
        levels = (16, 32, 64, 96, 128, 196)
        if self.packed:
            x = space_to_depth(x)
        for i, chans in enumerate(levels):
            packed = self.packed and i < 2
            x = Conv(chans, 3, 2, packed=packed, dtype=self.dtype)(x)
            x = Conv(chans, 3, 1, packed=packed, dtype=self.dtype)(x)
            x = Conv(chans, 3, 1, packed=packed, dtype=self.dtype)(x)
            if packed and i == 1:
                x = depth_to_space(x)  # level 2 feeds correlation
            feats.append(x)
        return feats  # strides 2, 4, 8, 16, 32, 64 (feats[0] may be packed)


class FlowPredictor(nn.Module):
    """DenseNet-style predictor (flow_net.py:127-147)."""

    up: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for chans in (128, 128, 96, 64):
            c = Conv(chans, 3, dtype=self.dtype)(x)
            x = jnp.concatenate([x, c], axis=-1)
        c = Conv(32, 3, dtype=self.dtype)(x)
        flow = Conv(2, 3, use_activation=False, dtype=self.dtype)(c)
        flow = flow.astype(jnp.float32)
        if not self.up:
            return flow, c
        up_flow = nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME",
                                   dtype=self.dtype,
                                   param_dtype=jnp.float32)(flow)
        up_feat = nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME",
                                   dtype=self.dtype, param_dtype=jnp.float32)(c)
        return flow, up_flow.astype(jnp.float32), up_feat


class ContextNetwork(nn.Module):
    """Dilated refinement (flow_net.py:149-157)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, flow):
        for chans, dil in ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16),
                           (32, 1)):
            x = Conv(chans, 3, dilation=dil, dtype=self.dtype)(x)
        refined = Conv(2, 3, use_activation=False, dtype=self.dtype)(x)
        return refined.astype(jnp.float32) + flow


class PWCNet(nn.Module):
    dtype: Any = jnp.float32
    use_pallas: bool = False  # Pallas correlation kernel (TPU only)
    packed_encoder: bool = False  # space-to-depth encoder levels 1-2

    def _corr(self, cl, cr, p):
        md = MAX_DISPLACEMENT // 2 ** p
        stride = max(md // 4, 1)
        if self.use_pallas:
            import jax

            from xpt_mde_tpu.ops.pallas.correlation import \
                correlation_cost_pallas
            # interpreter mode on CPU keeps the Pallas path testable there
            return correlation_cost_pallas(
                cl.astype(self.dtype), cr.astype(self.dtype), md, stride,
                interpret=jax.default_backend() == "cpu")
        return correlation_cost(cl.astype(self.dtype), cr.astype(self.dtype),
                                md, stride)

    @nn.compact
    def __call__(self, image5d, train: bool = False):
        batch, snippet, height, width, channels = image5d.shape
        numsrc = snippet - 1
        target = image5d[:, -1].astype(self.dtype)
        sources = image5d[:, :-1].reshape(batch * numsrc, height, width,
                                          channels).astype(self.dtype)

        # UNTIED target/source encoders -- reference parity: pwc_encode
        # builds distinct "_l"/"_r" weight sets (flow_net.py:29-30,65-84).
        # (Canonical PWC-Net shares the pyramid; the reference does not.)
        feats_l = PWCEncoder(dtype=self.dtype, packed=self.packed_encoder,
                             name="encoder_l")(target)
        feats_r = PWCEncoder(dtype=self.dtype, packed=self.packed_encoder,
                             name="encoder_r")(sources)
        # repeat target features for every source
        feats_l = [jnp.repeat(f, numsrc, axis=0) for f in feats_l]
        c2l, c3l, c4l, c5l, c6l = feats_l[1:]
        c2r, c3r, c4r, c5r, c6r = feats_r[1:]

        corr6 = self._corr(c6l, c6r, 6)
        flow6, up_flow6, up_feat6 = FlowPredictor(dtype=self.dtype)(corr6)

        def level(p, cl, cr, scale, up_flow, up_feat, up=True):
            cr_warp = flow_bilinear_sample(cr, up_flow * scale)
            corr = self._corr(cl, cr_warp.astype(self.dtype), p)
            x = jnp.concatenate(
                [corr, cl, up_flow.astype(self.dtype), up_feat], axis=-1)
            return FlowPredictor(up=up, dtype=self.dtype)(x)

        flow5, up_flow5, up_feat5 = level(5, c5l, c5r, 0.625, up_flow6, up_feat6)
        flow4, up_flow4, up_feat4 = level(4, c4l, c4r, 1.25, up_flow5, up_feat5)
        flow3, up_flow3, up_feat3 = level(3, c3l, c3r, 2.5, up_flow4, up_feat4)
        flow2, feat2 = level(2, c2l, c2r, 5.0, up_flow3, up_feat3, up=False)
        flow2 = ContextNetwork(dtype=self.dtype)(feat2, flow2)

        flow_ms = []
        for flow in (flow2, flow3, flow4, flow5):
            _, fh, fw, fc = flow.shape
            flow_ms.append(flow.reshape(batch, numsrc, fh, fw, fc))
        return {"flow_ms": flow_ms}
