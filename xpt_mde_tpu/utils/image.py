"""Image tensor helpers: value-range conversion, pyramids, safe reciprocal.

Behavioral spec carried over from the reference
(/root/reference/utils/util_funcs.py:79-190):
- float images live in [-1, 1]
- multi-scale depth pyramids use *nearest* resize, image pyramids *bilinear*
- disparity <-> depth duality via a masked reciprocal (zero stays zero)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def to_float_image(uint8_image: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [-1,1]."""
    return uint8_image.astype(jnp.float32) / 255.0 * 2.0 - 1.0


def to_uint8_image(float_image: jnp.ndarray) -> jnp.ndarray:
    """float [-1,1] -> uint8 [0,255]."""
    x = jnp.clip(float_image, -1.0, 1.0)
    return jnp.round((x + 1.0) / 2.0 * 255.0).astype(jnp.uint8)


def _axis_lerp_indices(dst: int, src: int):
    """Half-pixel-center sample positions for one axis, TF-style: lower
    index, upper index (both clipped) and the lerp fraction."""
    v = (jnp.arange(dst, dtype=jnp.float32) + 0.5) * (src / dst) - 0.5
    i0 = jnp.floor(v)
    frac = v - i0
    lo = jnp.clip(i0, 0, src - 1).astype(jnp.int32)
    hi = jnp.clip(i0 + 1, 0, src - 1).astype(jnp.int32)
    return lo, hi, frac


def resize_image(image: jnp.ndarray, height: int, width: int,
                 method: str = "bilinear") -> jnp.ndarray:
    """Resize [..., H, W, C] to [..., height, width, C] with
    tf.image.resize semantics (half-pixel centers, NO antialiasing).

    jax.image.resize antialiases on downscale, which diverges from the
    reference's tf.image.resize by up to ~0.26 on 2x downsampling --
    enough to shift every multi-scale loss. This separable gather+lerp
    matches TF bit-closely (tests/test_tf_parity.py).
    """
    src_h, src_w = image.shape[-3], image.shape[-2]
    if src_h == height and src_w == width:
        return image
    if method == "nearest":
        out_shape = image.shape[:-3] + (height, width, image.shape[-1])
        return jax.image.resize(image, out_shape, method="nearest")
    y0, y1, fy = _axis_lerp_indices(height, src_h)
    x0, x1, fx = _axis_lerp_indices(width, src_w)
    fy = fy[:, None, None].astype(image.dtype)
    fx = fx[:, None].astype(image.dtype)
    rows = (jnp.take(image, y0, axis=-3) * (1 - fy)
            + jnp.take(image, y1, axis=-3) * fy)
    return (jnp.take(rows, x0, axis=-2) * (1 - fx)
            + jnp.take(rows, x1, axis=-2) * fx)


def multi_scale_like(image: jnp.ndarray, pyramid: Sequence[jnp.ndarray],
                     method: str = "bilinear") -> list[jnp.ndarray]:
    """Resize ``image`` to the (H, W) of every tensor in ``pyramid``.

    Used to build target-image pyramids matching predicted depth/flow
    scales (reference: utils/util_funcs.py:163-190).
    """
    return [resize_image(image, p.shape[-3], p.shape[-2], method) for p in pyramid]


def multi_scale_depths(depth: jnp.ndarray, scales: Sequence[int]) -> list[jnp.ndarray]:
    """Nearest-neighbor depth pyramid: [B,H,W,1] -> list of [B,H/s,W/s,1]."""
    h, w = depth.shape[-3], depth.shape[-2]
    return [resize_image(depth, h // s, w // s, "nearest") for s in scales]


def safe_reciprocal(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Masked 1/x: values <= eps map to 0 (depth<->disparity duality)."""
    mask = (x > eps).astype(x.dtype)
    return mask / jnp.where(x > eps, x, 1.0)


def safe_reciprocal_ms(xs: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
    return [safe_reciprocal(x) for x in xs]
