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

    @nn.compact
    def __call__(self, x):
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


def upsample_2x(x: jnp.ndarray, method: str = "nearest") -> jnp.ndarray:
    """2x spatial upsampling of [..., H, W, C]."""
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
