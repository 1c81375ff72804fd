"""EfficientNet B0-B7 encoder (native Flax implementation).

Capability twin of the keras EfficientNet backbones used by the reference
(/root/reference/model/build_model/pretrained_nets.py:67-85); the headline
model uses EfficientNetB5 (config-example.py:218). Emits the 5 feature
maps at strides (2, 4, 8, 16, 32) that DepthNetPretrained's decoder
expects (tap points mirror scaled_layers.json: ends of stages 1, 2, 3, 5, 7).

TPU notes: BatchNorm keeps running stats in the ``batch_stats`` collection
(handled by the TrainState); swish fuses into the convs under XLA; all
convs run in the model dtype (bfloat16 by default) with f32 params.
"""

from __future__ import annotations

import math
import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# (expand_ratio, channels, repeats, stride, kernel) for B0
_B0_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

# (width_mult, depth_mult) per variant
_SCALING = {
    "B0": (1.0, 1.0), "B1": (1.0, 1.1), "B2": (1.1, 1.2), "B3": (1.2, 1.4),
    "B4": (1.4, 1.8), "B5": (1.6, 2.2), "B6": (1.8, 2.6), "B7": (2.0, 3.1),
}


def round_filters(filters: float, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def _dw_use_fma(height: int, width: int, channels: int, kernel: int,
                stride: int) -> bool:
    """Shape gate for the depthwise formulation (measured on v5e,
    benchmarks/probe_dw_matrix.py): XLA's grouped-conv lowering is
    near-floor except at LARGE-spatial / small-C stride-1 k3 sites,
    where the conv-backward layout relayouts dominate (fwd+bwd 2.2 ms
    lax vs 1.0 ms FMA at [4,128,512,48]). Everywhere else lax wins.
    Override with XPT_DW_MODE=lax|fma."""
    mode = os.environ.get("XPT_DW_MODE", "auto")
    if mode == "lax":
        return False
    if mode == "fma":
        return True
    return (stride == 1 and kernel == 3 and channels <= 64
            and height * width >= 128 * 512)


class DepthwiseConv(nn.Module):
    """Depthwise conv with a TPU shape-routed lowering.

    Param tree is identical to the grouped ``nn.Conv`` it replaces
    (one "kernel" of [kh, kw, 1, C]); callers pass ``name="Conv_i"`` so
    checkpoints and the keras converter (convert_keras.py) are
    unaffected. The FMA path expands the conv into k^2 shifted
    multiply-adds with f32 accumulation — the same products the MXU
    conv computes, so results are exact (probe err 0.0)."""

    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, 1, c), jnp.float32)
        x = x.astype(self.dtype)
        if not _dw_use_fma(h, w, c, self.kernel, self.stride):
            return jax.lax.conv_general_dilated(
                x, k.astype(self.dtype), (self.stride, self.stride),
                "SAME", feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # lax SAME padding, exact for any size/stride:
        # total = (ceil(in/s)-1)*s + k - in, lo = total//2
        def _same_pad(size):
            total = max((-(-size // self.stride) - 1) * self.stride
                        + self.kernel - size, 0)
            return total // 2, total - total // 2

        (ph_lo, ph_hi), (pw_lo, pw_hi) = _same_pad(h), _same_pad(w)
        xp = jnp.pad(x, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0)))
        kf = k.astype(self.dtype)[:, :, 0]
        s = self.stride
        out_h, out_w = -(-h // s), -(-w // s)
        acc = None
        for u in range(self.kernel):
            for v in range(self.kernel):
                t = jax.lax.slice(
                    xp, (0, u, v, 0),
                    (b, u + s * (out_h - 1) + 1, v + s * (out_w - 1) + 1, c),
                    (1, s, s, 1)).astype(jnp.float32) \
                    * kf[u, v].astype(jnp.float32)
                acc = t if acc is None else acc + t
        return acc.astype(self.dtype)


class SqueezeExcite(nn.Module):
    reduced_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(self.reduced_ch, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32)(se)
        se = nn.swish(se)
        se = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32)(se)
        return x * nn.sigmoid(se)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with SE and residual."""

    out_ch: int
    expand_ratio: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        residual = x
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.99, epsilon=1e-3,
                                    dtype=self.dtype, param_dtype=jnp.float32)
        # convs are explicitly named so the shape-routed DepthwiseConv
        # slots into the same "Conv_i" path the keras converter and
        # checkpoints address
        ci = 0
        if self.expand_ratio != 1:
            x = nn.Conv(in_ch * self.expand_ratio, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"Conv_{ci}")(x)
            ci += 1
            x = norm()(x)
            x = nn.swish(x)
        x = DepthwiseConv(self.kernel, self.stride, dtype=self.dtype,
                          name=f"Conv_{ci}")(x)
        ci += 1
        x = norm()(x)
        x = nn.swish(x)
        x = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), self.dtype)(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"Conv_{ci}")(x)
        x = norm()(x)
        if self.stride == 1 and in_ch == self.out_ch:
            x = x + residual
        return x


class EfficientNet(nn.Module):
    """EfficientNet encoder; ``variant`` in B0..B7.

    Returns [f2, f4, f8, f16, f32] feature maps for input [B, H, W, 3]
    in [-1, 1] (the reference feeds its [-1, 1] floats straight into the
    keras 0-255 pipeline -- preprocess_input is a pass-through for
    EfficientNet -- and we reproduce that quirk).

    keras builds preprocessing INTO the model: Rescaling(1/255) +
    Normalization, plus (imagenet weights only) an extra
    Rescaling(1/sqrt(std)) (keras efficientnet.py:325-338). The twin is
    an input normalization with ``batch_stats`` variables input_mean /
    input_var -- identity-equivalent (0, 1) when training from scratch,
    and populated by convert_efficientnet (which folds the extra
    rescaling into input_var) so converted ImageNet weights see exactly
    the keras stem input.
    """

    variant: str = "B5"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_mean = self.variable("batch_stats", "input_mean",
                                lambda: jnp.zeros(3, jnp.float32))
        in_var = self.variable("batch_stats", "input_var",
                               lambda: jnp.ones(3, jnp.float32))
        x = (x / 255.0 - in_mean.value) / jnp.sqrt(in_var.value)
        x = x.astype(self.dtype)
        width_mult, depth_mult = _SCALING[self.variant]
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.99, epsilon=1e-3,
                                    dtype=self.dtype, param_dtype=jnp.float32)
        # stem: stride 2
        x = nn.Conv(round_filters(32, width_mult), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = norm()(x)
        x = nn.swish(x)

        taps = []
        for stage_idx, (expand, ch, reps, stride, kernel) in enumerate(_B0_STAGES):
            out_ch = round_filters(ch, width_mult)
            for rep in range(round_repeats(reps, depth_mult)):
                s = stride if rep == 0 else 1
                x = MBConv(out_ch, expand, s, kernel, dtype=self.dtype)(x, train)
            # tap at ends of stages 1, 2, 3, 5, 7 -> strides 2, 4, 8, 16, 32
            if stage_idx in (0, 1, 2, 4, 6):
                taps.append(x)
        return taps
