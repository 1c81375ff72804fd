"""Multi-scale view synthesis: warp source frames into the target view.

Re-designs /root/reference/model/synthesize/synthesize_base.py as pure
functions: twist -> SE(3) once, then per depth scale scale the intrinsics,
resize the sources, reproject and bilinearly sample. Zero-depth and
out-of-view pixels come out black (masked later by the photometric losses).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from xpt_mde_tpu.ops.camera import reproject_pixel_coords, scale_intrinsics
from xpt_mde_tpu.ops.warp import bilinear_sample
from xpt_mde_tpu.utils import se3
from xpt_mde_tpu.utils.image import resize_image


def synthesize_single_scale(source_image: jnp.ndarray, intrinsic: jnp.ndarray,
                            depth: jnp.ndarray, pose_matr: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct the target view at one scale.

    :param source_image: [batch, numsrc, height_sc, width_sc, 3] (already
        resized to the depth's scale)
    :param intrinsic: [batch, 3, 3] (already scaled)
    :param depth: target depth [batch, height_sc, width_sc, 1]
    :param pose_matr: target->source transforms [batch, numsrc, 4, 4]
    :return: [batch, numsrc, height_sc, width_sc, 3]
    """
    src_pixel_coords = reproject_pixel_coords(depth, pose_matr, intrinsic)
    # source frames are training data, never differentiated -> the
    # gather-free const-src Pallas warp is eligible on TPU
    return bilinear_sample(source_image, src_pixel_coords, valid_mask=depth,
                           const_src=True)


def synthesize_multi_scale(source_image: jnp.ndarray, intrinsic: jnp.ndarray,
                           depth_ms: Sequence[jnp.ndarray],
                           pose: jnp.ndarray) -> list[jnp.ndarray]:
    """Reconstruct the target view at every predicted depth scale.

    :param source_image: [batch, numsrc, height, width, 3]
    :param intrinsic: [batch, 3, 3] at full resolution
    :param depth_ms: list of [batch, height/s, width/s, 1]
    :param pose: target->source twists [batch, numsrc, 6] OR matrices
        [batch, numsrc, 4, 4]
    :return: list of [batch, numsrc, height/s, width/s, 3]
    """
    if pose.ndim == 3 and pose.shape[-1] == 6:
        pose_matr = se3.twist_to_matrix(pose)
    else:
        pose_matr = pose

    batch, numsrc, height, width, chans = source_image.shape
    flat_src = source_image.reshape(batch * numsrc, height, width, chans)

    synth_targets = []
    for depth_sc in depth_ms:
        height_sc, width_sc = depth_sc.shape[1:3]
        scale = height // height_sc
        intrinsic_sc = scale_intrinsics(intrinsic, float(scale))
        src_sc = resize_image(flat_src, height_sc, width_sc, "bilinear")
        src_sc = src_sc.reshape(batch, numsrc, height_sc, width_sc, chans)
        synth_targets.append(
            synthesize_single_scale(src_sc, intrinsic_sc, depth_sc, pose_matr))
    return synth_targets
