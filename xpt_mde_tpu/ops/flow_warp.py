"""Optical-flow based warping (dense image warp).

Re-designs /root/reference/model/synthesize/flow_warping.py and the
tfa.image.dense_image_warp CUDA op as pure jnp on top of the shared
bilinear sampler: target pixel (u, v) samples source at (u, v) - flow.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from xpt_mde_tpu.ops.warp import bilinear_sample
from xpt_mde_tpu.utils.image import resize_image


def flow_to_pixel_coords(flow: jnp.ndarray) -> jnp.ndarray:
    """Convert flow maps to absolute source pixel coordinates.

    Matches the reference's sign convention ``uvgrid - uvflow``
    (flow_warping.py:182-202).

    :param flow: [batch, numsrc, height, width, 2(u,v)]
    :return: [batch, numsrc, 2, height*width]
    """
    batch, numsrc, height, width, _ = flow.shape
    u, v = jnp.meshgrid(jnp.arange(width, dtype=flow.dtype),
                        jnp.arange(height, dtype=flow.dtype))
    uvgrid = jnp.stack([u, v], axis=0).reshape(1, 1, 2, -1)
    uvflow = flow.reshape(batch, numsrc, -1, 2).transpose(0, 1, 3, 2)
    return uvgrid - uvflow


def flow_bilinear_sample(image: jnp.ndarray, flow: jnp.ndarray,
                         const_src: bool = False) -> jnp.ndarray:
    """Warp ``image`` by a dense flow field (dense_image_warp equivalent).

    :param image: [batch*numsrc, height, width, C]
    :param flow: [batch*numsrc, height, width, 2(u,v)]
    :param const_src: image is never differentiated (loss-side warps of
        data frames; NOT PWC-Net's feature warps, which need image grads)
    :return: [batch*numsrc, height, width, C]
    """
    feat = image[:, None]
    coords = flow_to_pixel_coords(flow[:, None])
    warped = bilinear_sample(feat, coords, const_src=const_src)
    return warped[:, 0]


def flow_warp_multi_scale(source_image: jnp.ndarray,
                          flow_ms: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
    """Warp sources into the target view by multi-scale predicted flow.

    :param source_image: [batch, numsrc, height, width, 3]
    :param flow_ms: list of [batch, numsrc, height/s, width/s, 2]
    :return: list of [batch, numsrc, height/s, width/s, 3]
    """
    batch, numsrc, height, width, chans = source_image.shape
    flat_src = source_image.reshape(batch * numsrc, height, width, chans)
    warped_ms = []
    for flow in flow_ms:
        height_sc, width_sc = flow.shape[2:4]
        src_sc = resize_image(flat_src, height_sc, width_sc, "bilinear")
        flow_flat = flow.reshape(batch * numsrc, height_sc, width_sc, 2)
        warped = flow_bilinear_sample(src_sc, flow_flat, const_src=True)
        warped_ms.append(warped.reshape(batch, numsrc, height_sc, width_sc, chans))
    return warped_ms
