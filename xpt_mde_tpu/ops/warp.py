"""Differentiable bilinear sampling with validity masking.

Behavioral spec from /root/reference/model/synthesize/bilinear_interp.py:5-147:

- floor/ceil neighbor pixels are clipped into the image; a neighbor pair
  whose ceil != floor+1 after clipping (i.e. the sample falls outside or
  exactly on the far border) is INVALID.
- optional per-target-pixel ``valid_mask`` (zero entries, e.g. zero depth)
  also invalidates.
- invalid pixels get weight 0 for all four neighbors -> pure black output,
  which the photometric losses then mask out.

TPU design: rather than 4 gather_nd calls, we flatten (v, u) to a single
flat index per neighbor and use one batched take_along_axis per neighbor
over the [B*N, H*W, C] image. XLA lowers this to vector gathers; the
Pallas kernel in ops/pallas/warp.py replaces it on the training hot path
(same semantics, fused with the weighting).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(image: jnp.ndarray, pixel_coords: jnp.ndarray,
                    valid_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sample ``image`` at floating-point ``pixel_coords``.

    :param image: source images [batch, numsrc, height, width, channels]
    :param pixel_coords: (u, v[, 1]) [batch, numsrc, 2 or 3, height*width]
        pixel coordinates into the *source* image for every *target* pixel
    :param valid_mask: optional [batch, height, width, 1]; zero entries are
        invalid target pixels (e.g. zero-depth)
    :return: reconstructed target view [batch, numsrc, height, width, channels]
    """
    batch, numsrc, height, width, channels = image.shape
    u = pixel_coords[:, :, 0]  # [B,N,HW]
    v = pixel_coords[:, :, 1]

    uf = jnp.floor(u)
    uc = jnp.clip(uf + 1.0, 0.0, width - 1)
    uf = jnp.clip(uf, 0.0, width - 1)
    vf = jnp.floor(v)
    vc = jnp.clip(vf + 1.0, 0.0, height - 1)
    vf = jnp.clip(vf, 0.0, height - 1)

    # validity: neighbor pair intact after clipping
    valid = jnp.logical_and(uf + 1.0 == uc, vf + 1.0 == vc)
    if valid_mask is not None:
        nonzero = (valid_mask.reshape(batch, 1, -1) != 0)
        valid = jnp.logical_and(valid, nonzero)
    valid = valid.astype(image.dtype)  # [B,N,HW]

    # bilinear weights, zeroed where invalid
    w_uf, w_uc = uc - u, u - uf
    w_vf, w_vc = vc - v, v - vf
    weights = (
        (w_uf * w_vf)[..., None], (w_uf * w_vc)[..., None],
        (w_uc * w_vf)[..., None], (w_uc * w_vc)[..., None],
    )  # each [B,N,HW,1]

    flat_image = image.reshape(batch, numsrc, height * width, channels)
    uf_i, uc_i = uf.astype(jnp.int32), uc.astype(jnp.int32)
    vf_i, vc_i = vf.astype(jnp.int32), vc.astype(jnp.int32)

    def gather(vi, ui):
        idx = (vi * width + ui)[..., None]  # [B,N,HW,1]
        return jnp.take_along_axis(flat_image, idx, axis=2)

    samples = (gather(vf_i, uf_i), gather(vc_i, uf_i),
               gather(vf_i, uc_i), gather(vc_i, uc_i))

    out = sum(w * s for w, s in zip(weights, samples))
    out = out * valid[..., None]
    return out.reshape(batch, numsrc, height, width, channels)
