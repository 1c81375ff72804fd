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


def _axis_resize_matrix(dst: int, src: int) -> jnp.ndarray:
    """[dst, src] float32 bilinear interpolation matrix with TF
    half-pixel-center semantics and NO antialiasing: row o holds
    (1-frac) at floor and frac at floor+1 (clipped). Always float32 --
    bf16 weights would quietly break the TF-exactness pin, and integer
    image dtypes would truncate every fraction to zero."""
    v = (jnp.arange(dst, dtype=jnp.float32) + 0.5) * (src / dst) - 0.5
    i0 = jnp.floor(v)
    frac = v - i0
    lo = jnp.clip(i0, 0, src - 1).astype(jnp.int32)
    hi = jnp.clip(i0 + 1, 0, src - 1).astype(jnp.int32)
    eye = jnp.eye(src, dtype=jnp.float32)
    return (eye[lo] * (1.0 - frac)[:, None] + eye[hi] * frac[:, None])


def resize_image(image: jnp.ndarray, height: int, width: int,
                 method: str = "bilinear") -> jnp.ndarray:
    """Resize [..., H, W, C] to [..., height, width, C] with
    tf.image.resize semantics (half-pixel centers, NO antialiasing).

    jax.image.resize antialiases on downscale, which diverges from the
    reference's tf.image.resize by up to ~0.26 on 2x downsampling --
    enough to shift every multi-scale loss.

    TPU note: implemented as two small dense matmul contractions (the
    interpolation matrices are trace-time constants) -- gathers on TPU
    serialize and cost ~100ms per training step at these shapes, while
    the MXU eats the equivalent matmuls in microseconds.
    """
    src_h, src_w = image.shape[-3], image.shape[-2]
    if src_h == height and src_w == width:
        return image
    if method == "nearest":
        out_shape = image.shape[:-3] + (height, width, image.shape[-1])
        return jax.image.resize(image, out_shape, method="nearest")
    my = _axis_resize_matrix(height, src_h)  # [h', H], f32
    mx = _axis_resize_matrix(width, src_w)   # [w', W], f32
    lead = image.shape[:-3]
    chans = image.shape[-1]
    # interpolate in float32 regardless of image dtype (tf.image.resize
    # computes in float and returns float for integer inputs); cast back
    # only for float inputs so bf16 activations keep their dtype
    flat = image.reshape((-1, src_h, src_w, chans)).astype(jnp.float32)
    # rows: [B, h', W, C] = my [h',H] x flat [B,H,W,C]
    rows = jnp.einsum("oY,bYXc->boXc", my, flat,
                      precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("oX,byXc->byoc", mx, rows,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(lead + (height, width, chans))
    if jnp.issubdtype(image.dtype, jnp.floating):
        out = out.astype(image.dtype)
    return out


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
