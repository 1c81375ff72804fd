"""Shared conv building blocks with the framework's default hyperparams.

Defaults carried over from /root/reference/model/model_util/layer_ops.py:5-36
and config-example.py:59-65: LeakyReLU(0.1) activation, truncated-normal
(stddev 0.025) kernel init, SAME padding.

TPU notes: convs run in ``dtype`` (bfloat16 by default via the model's
setting) with float32 params; XLA fuses the activation into the conv.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def default_kernel_init(stddev: float = 0.025):
    return nn.initializers.truncated_normal(stddev=stddev)


def leaky_relu(x, negative_slope: float = 0.1):
    return nn.leaky_relu(x, negative_slope=negative_slope)


class Conv(nn.Module):
    """Conv2D with framework defaults: k3 s1 SAME, LeakyReLU(0.1),
    truncated-normal(0.025) init. ``activation=None`` means linear."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_activation: bool = True
    dtype: Any = jnp.float32
    packed: bool = False  # space-to-depth input; see PackedConv2D

    @nn.compact
    def __call__(self, x):
        if self.packed:
            assert (self.kernel_size, self.dilation) == (3, 1) \
                and self.strides in (1, 2), \
                "packed conv is 3x3 stride-1/2 only"
            # name="Conv_0" keeps the param tree identical to the
            # unpacked nn.Conv path (checkpoint compatibility)
            x = PackedConv2D(self.features, strides=self.strides,
                             dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(self.features,
                        kernel_size=(self.kernel_size, self.kernel_size),
                        strides=(self.strides, self.strides),
                        kernel_dilation=(self.dilation, self.dilation),
                        padding="SAME",
                        kernel_init=default_kernel_init(),
                        dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        if self.use_activation:
            x = leaky_relu(x)
        return x


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], block-major packed channels:
    packed channel (di*2 + dj)*C + c holds x[2i+di, 2j+dj, c]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def packed_concat(parts) -> jnp.ndarray:
    """Channel-concat in the packed domain: interleaves the four (di, dj)
    blocks so the result equals space_to_depth(concat(unpacked parts))."""
    blocks = [p.reshape(p.shape[:-1] + (4, p.shape[-1] // 4)) for p in parts]
    cat = jnp.concatenate(blocks, axis=-1)
    return cat.reshape(cat.shape[:-2] + (4 * cat.shape[-1],))


def _pack_placement():
    """Static (tap index, validity) tables for pack_conv_kernel:
    [3, 3, 4(in-block), 4(out-block)] -> flattened 3x3 tap (or 0) +
    mask. Pure numpy constants — shape-independent."""
    idx = np.zeros((3, 3, 4, 4), np.int32)
    msk = np.zeros((3, 3, 4, 4), np.float32)
    for s in range(3):
        for t in range(3):
            for di in range(2):
                for dj in range(2):
                    u = 2 * (s - 1) + di
                    v = 2 * (t - 1) + dj
                    for oi in range(2):
                        for oj in range(2):
                            if -1 <= u - oi <= 1 and -1 <= v - oj <= 1:
                                ib, ob = di * 2 + dj, oi * 2 + oj
                                idx[s, t, ib, ob] = (u - oi + 1) * 3 \
                                    + (v - oj + 1)
                                msk[s, t, ib, ob] = 1.0
    return idx, msk


_PACK_IDX, _PACK_MASK = _pack_placement()


def _pack_placement_s2():
    """Static tap tables for the STRIDE-2 kernel lift. Fine-grid
    stride-2 k3 SAME conv on even-size input pads (0, 1), so
    out[r] = sum_u w[u] in[2r+u]; packed output row (I, oi) is fine row
    2I+oi and reads fine input rows 4I+2oi+u -> packed input rows 2I+s
    with sub-offset di where u = 2s + di - 2oi (valid for 0 <= u <= 2).
    The packed conv is then itself stride-2 k3 with padding (0, 1) and
    produces PACKED output (both spatial dims halve twice overall)."""
    idx = np.zeros((3, 3, 4, 4), np.int32)
    msk = np.zeros((3, 3, 4, 4), np.float32)
    for s in range(3):
        for t in range(3):
            for di in range(2):
                for dj in range(2):
                    for oi in range(2):
                        for oj in range(2):
                            u = 2 * s + di - 2 * oi
                            v = 2 * t + dj - 2 * oj
                            if 0 <= u <= 2 and 0 <= v <= 2:
                                ib, ob = di * 2 + dj, oi * 2 + oj
                                idx[s, t, ib, ob] = u * 3 + v
                                msk[s, t, ib, ob] = 1.0
    return idx, msk


_S2_IDX, _S2_MASK = _pack_placement_s2()


def pack_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Lift a 3x3 stride-1 SAME conv kernel [3, 3, Cin, Cout] to the
    space-to-depth domain: [3, 3, 4Cin, 4Cout] such that
    conv(x, w) == depth_to_space(conv(space_to_depth(x), wp)) exactly
    (same multiply-adds; zero blocks where a fine-grid tap falls outside
    the 3x3 footprint). Fine-grid row 2i+oi+u maps to packed row i+s
    with sub-offset di via u = 2s + di - oi; the (block -> tap) map is
    the static _PACK_IDX table, so the lift is ONE gather + mask per
    forward instead of 144 traced buffer updates."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), "packed conv supports 3x3 kernels only"
    taps = w.reshape(9, cin, cout)[_PACK_IDX]       # [3,3,4,4,Cin,Cout]
    taps = taps * jnp.asarray(_PACK_MASK, w.dtype)[..., None, None]
    # block-major packed channels: [3,3, ib,Cin, ob,Cout] -> [3,3,4Ci,4Co]
    return taps.transpose(0, 1, 2, 4, 3, 5).reshape(3, 3, 4 * cin, 4 * cout)


def pack_conv_kernel_s2(w: jnp.ndarray) -> jnp.ndarray:
    """Lift a 3x3 STRIDE-2 SAME conv kernel [3, 3, Cin, Cout] to the
    space-to-depth domain [3, 3, 4Cin, 4Cout] such that
    s2d(conv_s2(x, w)) == conv_s2(s2d(x), wp) with explicit padding
    ((0, 1), (0, 1)) on the packed conv -- input AND output packed, so
    a packed net never leaves the packed domain at stride-2 levels.
    Requires even input H, W (TF SAME for stride-2 k3 then pads (0, 1),
    which the lift bakes in; see _pack_placement_s2)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), "packed conv supports 3x3 kernels only"
    taps = w.reshape(9, cin, cout)[_S2_IDX]
    taps = taps * jnp.asarray(_S2_MASK, w.dtype)[..., None, None]
    return taps.transpose(0, 1, 2, 4, 3, 5).reshape(3, 3, 4 * cin, 4 * cout)


class PackedConv2D(nn.Module):
    """3x3 SAME conv evaluated in the space-to-depth domain.

    Parameters are IDENTICAL to ``nn.Conv`` on the unpacked tensor
    (kernel [3, 3, Cin, features], bias [features]) so checkpoints are
    interchangeable with the unpacked path; only the computation runs on
    [B, H/2, W/2, 4Cin] -> [B, H/2, W/2, 4*features]. Small-channel
    full-resolution convs (the decoder's C=16..32 tail) are lane-starved
    on TPU -- C-minor layouts pad the channel dim to 128 lanes, an 8x
    memory and MXU waste measured at 4.3 TF/s; packed they run with
    64..128 effective channels at 4x the FLOPs but ~10x the rate."""

    features: int  # ORIGINAL (unpacked) output channels
    strides: int = 1  # stride-2 stays in the packed domain (s2 lift)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        cin = xp.shape[-1] // 4
        kernel = self.param("kernel", default_kernel_init(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if self.strides == 2:
            wp = pack_conv_kernel_s2(kernel).astype(self.dtype)
            pad = ((0, 1), (0, 1))
        else:
            wp = pack_conv_kernel(kernel).astype(self.dtype)
            pad = "SAME"
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), wp, (self.strides, self.strides), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.tile(bias, 4).astype(self.dtype)


def upsample_2x(x: jnp.ndarray, method: str = "nearest") -> jnp.ndarray:
    """2x spatial upsampling of [..., H, W, C]."""
    if method not in ("nearest", "linear", "bilinear"):
        # a typo here would also silently disable the packed decoder
        # tail (DepthDecoder gates on upsample_interp == "nearest")
        raise ValueError(f"unknown upsample method: {method!r}")
    shape = x.shape[:-3] + (x.shape[-3] * 2, x.shape[-2] * 2, x.shape[-1])
    m = "nearest" if method == "nearest" else "linear"
    return jax.image.resize(x, shape, method=m)


def resize_like(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Bilinear resize of x's (H, W) to ref's (layer_ops.py:39-50);
    tf.image.resize semantics via utils.image.resize_image."""
    from xpt_mde_tpu.utils.image import resize_image
    return resize_image(x, ref.shape[-3], ref.shape[-2], "bilinear")


def resize_hw(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    from xpt_mde_tpu.utils.image import resize_image
    return resize_image(x, height, width, "bilinear")


def restack_on_channels(image5d: jnp.ndarray) -> jnp.ndarray:
    """[B, S, H, W, C] -> [B, H, W, S*C] (pose_net.py:44-50)."""
    b, s, h, w, c = image5d.shape
    return image5d.transpose(0, 2, 3, 1, 4).reshape(b, h, w, s * c)


class InverseSigmoidActivation:
    """depth = 1 / (sigmoid(x) + 0.01), range ~(0.99, 100) m
    (model_factory.py:134-138)."""

    def __call__(self, x):
        y = jax.nn.sigmoid(x) + 0.01
        return 1.0 / y  # y >= 0.01, no mask needed


class ExponentialActivation:
    """depth = exp(sigmoid(x + 1) * 10 - 5) (model_factory.py:141-145)."""

    def __call__(self, x):
        return jnp.exp(jax.nn.sigmoid(x + 1.0) * 10.0 - 5.0)


def activation_factory(name: str) -> Callable:
    if name == "InverseSigmoid":
        return InverseSigmoidActivation()
    if name == "Exponential":
        return ExponentialActivation()
    raise ValueError(f"wrong activation name: {name}")
