"""Pinhole camera geometry: pixel grids, intrinsics, reprojection.

Re-designs /root/reference/model/synthesize/synthesize_base.py:106-178 as
pure functions. Two paths are provided:

1. The step-by-step chain (``pixel2cam`` -> ``transform_to_source`` ->
   ``cam2pixel``) mirroring the reference for tests and debug tools.
2. A fused ``reproject_pixel_coords`` that folds K^-1, the SE(3) transform
   and K into a single 3x4 projective map per source frame:
       uv_src ~ (K R K^-1) (uv1 * d) + K t
   One batched matmul over all pixels instead of three -- this is what the
   training path uses; XLA maps it onto the MXU.

Conventions: pixel coords are (u, v, 1) stacked as rows, [.., 3, H*W];
depth is the target-frame z; pose matrices transform target -> source.
The projection guard ``z + 1e-10`` matches synthesize_base.py:177.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_Z_EPS = 1e-10

# Pixel-coordinate math must be exact: on TPU the default matmul precision
# is bfloat16 passes, which shifts reprojected pixels by ~0.3% of the image
# and corrupts the photometric gradient. These are tiny 3x3-contraction
# matmuls, so full float32 (HIGHEST) is effectively free.
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel-coordinate grid (u, v, 1), shape [3, height*width]."""
    u, v = jnp.meshgrid(jnp.arange(width, dtype=dtype),
                        jnp.arange(height, dtype=dtype))
    uv = jnp.stack([u, v], axis=0).reshape(2, -1)
    ones = jnp.ones((1, height * width), dtype=dtype)
    return jnp.concatenate([uv, ones], axis=0)


def scale_intrinsics(intrinsic: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Divide the first two rows of K by ``scale`` (image downscaled by s).

    :param intrinsic: [..., 3, 3]
    """
    scaler = jnp.array([[1.0 / scale], [1.0 / scale], [1.0]],
                       dtype=intrinsic.dtype)
    return intrinsic * scaler


def invert_intrinsics(intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a pinhole K = [[fx,s,cx],[0,fy,cy],[0,0,1]].

    Analytic form avoids a general 3x3 solve on device and is exact for
    the (possibly skewed) upper-triangular intrinsics this domain uses.
    """
    fx = intrinsic[..., 0, 0]
    sk = intrinsic[..., 0, 1]
    cx = intrinsic[..., 0, 2]
    fy = intrinsic[..., 1, 1]
    cy = intrinsic[..., 1, 2]
    one = jnp.ones_like(fx)
    zero = jnp.zeros_like(fx)
    row0 = jnp.stack([1.0 / fx, -sk / (fx * fy), (sk * cy - cx * fy) / (fx * fy)], -1)
    row1 = jnp.stack([zero, 1.0 / fy, -cy / fy], -1)
    row2 = jnp.stack([zero, zero, one], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def pixel2cam(pixel_coords: jnp.ndarray, depth: jnp.ndarray,
              intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Back-project pixels to homogeneous 3D target-frame points.

    :param pixel_coords: (u,v,1) [3, H*W]
    :param depth: [batch, H, W, 1]
    :param intrinsic: [batch, 3, 3]
    :return: (x,y,z,1) [batch, 4, H*W]
    """
    batch = depth.shape[0]
    depth_flat = depth.reshape(batch, 1, -1)
    cam = _mm(invert_intrinsics(intrinsic), pixel_coords)  # [B,3,HW]
    cam = cam * depth_flat
    ones = jnp.ones((batch, 1, cam.shape[-1]), dtype=cam.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def transform_to_source(tgt_coords: jnp.ndarray, t2s_pose: jnp.ndarray) -> jnp.ndarray:
    """Apply per-source target->source transforms.

    :param tgt_coords: (x,y,z,1) [batch, 4, H*W]
    :param t2s_pose: [batch, numsrc, 4, 4]
    :return: [batch, numsrc, 4, H*W]
    """
    return _mm(t2s_pose, tgt_coords[:, None])


def cam2pixel(cam_coords: jnp.ndarray, intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Project source-frame points onto the source image plane.

    :param cam_coords: (x,y,z,1) [batch, numsrc, 4, H*W]
    :param intrinsic: [batch, 3, 3]
    :return: (u,v,1) [batch, numsrc, 3, H*W]
    """
    points = cam_coords[:, :, :3]
    pixels = _mm(intrinsic[:, None], points)
    return pixels / (pixels[:, :, 2:3] + _Z_EPS)


def reproject_pixel_coords(depth: jnp.ndarray, t2s_pose: jnp.ndarray,
                           intrinsic: jnp.ndarray,
                           grid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fused reprojection: target depth + pose -> source pixel coords.

    Mathematically identical to pixel2cam -> transform_to_source ->
    cam2pixel (up to fp association), but folds the three matmul chains
    into one [B,N,3,3] x [B,1,3,HW] contraction plus a rank-1 add.

    :param depth: [batch, H, W, 1] target depth
    :param t2s_pose: [batch, numsrc, 4, 4] target->source transforms
    :param intrinsic: [batch, 3, 3]
    :param grid: optional precomputed pixel grid [3, H*W]
    :return: (u,v) source pixel coords [batch, numsrc, 2, H*W]
    """
    batch, height, width, _ = depth.shape
    if grid is None:
        grid = pixel_grid(height, width, depth.dtype)
    kinv = invert_intrinsics(intrinsic)  # [B,3,3]
    rot = t2s_pose[:, :, :3, :3]  # [B,N,3,3]
    tr = t2s_pose[:, :, :3, 3:]  # [B,N,3,1]
    # A = K R K^-1: [B,N,3,3];  b = K t: [B,N,3,1]
    a_mat = _mm(_mm(intrinsic[:, None], rot), kinv[:, None])
    b_vec = _mm(intrinsic[:, None], tr)
    # rays scaled by depth: [B,1,3,HW]
    xyd = (grid * depth.reshape(batch, 1, 1, -1))
    pixels = _mm(a_mat, xyd) + b_vec  # [B,N,3,HW]
    pixels = pixels / (pixels[:, :, 2:3] + _Z_EPS)
    return pixels[:, :, :2]
