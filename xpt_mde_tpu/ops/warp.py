"""Differentiable bilinear sampling with validity masking.

Behavioral spec from /root/reference/model/synthesize/bilinear_interp.py:5-147:

- floor/ceil neighbor pixels are clipped into the image; a neighbor pair
  whose ceil != floor+1 after clipping (i.e. the sample falls outside or
  exactly on the far border) is INVALID.
- optional per-target-pixel ``valid_mask`` (zero entries, e.g. zero depth)
  also invalidates.
- invalid pixels get weight 0 for all four neighbors -> pure black output,
  which the photometric losses then mask out.

TPU design -- measured on v5e with XLA's cost model (bytes accessed for a
batch-8 4-source 128x512 warp):

- naive per-pixel gathers (4x take_along_axis)        ~560 GB
- ONE lax.gather of 2x2xC patches                     ~ 45 GB
- one-hot matmul formulation (MXU, no gather at all)  ~ linear

so sampling is a hybrid: small scales (HW <= ONEHOT_MAX_PIXELS) build
one-hot selection matrices that XLA fuses into MXU dots; the full-res
scale uses the single patch gather. Gradients: one-hot path
differentiates to transposed matmuls (clean); patch path to scatter-add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# one-hot dot cost is B*N*HW^2*C MACs; below this pixel count the MXU
# eats it and it beats any gather formulation -- but only for few-channel
# images (C<=8): warping wide feature maps (e.g. PWC-Net's 196-channel
# pyramids) through a HW^2 dot would cost ~1e14 FLOPs
ONEHOT_MAX_PIXELS = 32 * 128 + 1
ONEHOT_MAX_CHANNELS = 8

# optional reduced-precision gather storage (Config.warp_gather_dtype).
# r2 measurement (benchmarks/probe_gather.py P4): the TPU gather costs
# ~14 ns/index regardless of operand dtype, so bf16 does NOT speed the
# gather up -- it only halves the packed-patch HBM footprint. Kept as a
# memory knob; not a throughput knob.
GATHER_DTYPE = None  # None = operand dtype; jnp.bfloat16 to opt in


def set_gather_dtype(dtype) -> None:
    """Set the patch-gather storage dtype (None restores full precision)."""
    global GATHER_DTYPE
    GATHER_DTYPE = dtype


def _neighbor_weights(image, pixel_coords, valid_mask):
    """Shared neighbor/weight/validity computation. Returns
    (uf, vf, uc, vc as int32 [B,N,HW]) and weights (4x [B,N,HW])."""
    batch, numsrc, height, width, _ = image.shape
    u = pixel_coords[:, :, 0]
    v = pixel_coords[:, :, 1]

    uf = jnp.floor(u)
    uc = jnp.clip(uf + 1.0, 0.0, width - 1)
    uf = jnp.clip(uf, 0.0, width - 1)
    vf = jnp.floor(v)
    vc = jnp.clip(vf + 1.0, 0.0, height - 1)
    vf = jnp.clip(vf, 0.0, height - 1)

    valid = jnp.logical_and(uf + 1.0 == uc, vf + 1.0 == vc)
    if valid_mask is not None:
        nonzero = (valid_mask.reshape(batch, 1, -1) != 0)
        valid = jnp.logical_and(valid, nonzero)
    valid = valid.astype(image.dtype)

    w_uf, w_uc = uc - u, u - uf
    w_vf, w_vc = vc - v, v - vf
    weights = (w_uf * w_vf * valid, w_uf * w_vc * valid,
               w_uc * w_vf * valid, w_uc * w_vc * valid)
    ints = (uf.astype(jnp.int32), vf.astype(jnp.int32),
            uc.astype(jnp.int32), vc.astype(jnp.int32))
    return ints, weights


def _sample_onehot(image, ints, weights):
    """MXU formulation: fold the 4 weighted neighbors into one sparse
    selection matrix [B,N,HW_out,HW_in] (XLA fuses the one-hots into the
    dot -- nothing materializes at HW^2 scale)."""
    batch, numsrc, height, width, channels = image.shape
    hw = height * width
    uf, vf, uc, vc = ints
    flat_idx = (vf * width + uf, vc * width + uf,
                vf * width + uc, vc * width + uc)
    select = sum(
        jax.nn.one_hot(idx, hw, dtype=image.dtype) * w[..., None]
        for idx, w in zip(flat_idx, weights))
    flat_image = image.reshape(batch, numsrc, hw, channels)
    out = jnp.einsum("bnpq,bnqc->bnpc", select, flat_image)
    return out.reshape(batch, numsrc, height, width, channels)


def _sample_patch_gather(image, ints, weights):
    """Full-res formulation: pre-pack every 2x2xC neighborhood into the
    channel dim (4 statically shifted copies), then ONE take_along_axis
    per pixel. The packed slice is contiguous in lanes, so each index
    costs a single TPU tile read -- ~5x less traffic than gathering an
    unpacked 2x2 patch and ~60x less than four per-pixel gathers."""
    batch, numsrc, height, width, channels = image.shape
    uf, vf, uc, vc = ints
    # patch image [B,N,H,W,4C]: (p00, p10, p01, p11) neighborhoods
    padded = jnp.pad(image, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    patch_img = jnp.concatenate([
        padded[:, :, :height, :width],        # img[v, u]
        padded[:, :, 1:height + 1, :width],   # img[v+1, u]
        padded[:, :, :height, 1:width + 1],   # img[v, u+1]
        padded[:, :, 1:height + 1, 1:width + 1],
    ], axis=-1).reshape(batch, numsrc, height * width, 4 * channels)

    # XLA's TPU gather runs ~10x cheaper when the gathered slice spans a
    # full register row (measured: minor dim >= 64 -> ~5.7 KB/index vs
    # ~70 KB/index below). Pad the packed patches up to 64 lanes and pin
    # the padded operand with an optimization barrier so XLA can't fuse
    # the pad/slice back into a narrow gather.
    out_dtype = image.dtype
    if GATHER_DTYPE is not None:
        patch_img = patch_img.astype(GATHER_DTYPE)
    lane_min = 64
    packed = 4 * channels
    if packed < lane_min:
        patch_img = jnp.pad(
            patch_img, ((0, 0), (0, 0), (0, 0), (0, lane_min - packed)))
        patch_img = jax.lax.optimization_barrier(patch_img)

    flat_idx = (vf * width + uf)[..., None]  # [B,N,HW,1]
    patches = jnp.take_along_axis(patch_img, flat_idx, axis=2)[..., :packed]
    patches = patches.reshape(batch, numsrc, height * width, 4,
                              channels).astype(out_dtype)
    # wherever a weight is nonzero the validity mask guarantees
    # vc==vf+1 and uc==uf+1, so the packed corners ARE the 4 neighbors
    w_ff, w_fc, w_cf, w_cc = (w[..., None] for w in weights)
    out = (patches[:, :, :, 0] * w_ff + patches[:, :, :, 1] * w_fc
           + patches[:, :, :, 2] * w_cf + patches[:, :, :, 3] * w_cc)
    return out.reshape(batch, numsrc, height, width, channels)


# const-src Pallas routing (ops/pallas/warp.py): the gather-free
# MXU/VPU kernel. Only for warps whose image operand is never
# differentiated (its image cotangent is zero). int8 mode (default)
# quantizes the image onto the uint8 pixel grid and runs the exact
# one-hot selections as int8 MXU dots (2x the bf16 rate): EXACT for
# values that came from uint8 pixels, <= 1/255 for augmented ones, at
# ~5x the XLA gather. "bf16" (single bf16 term, ~2e-3, ~3.5x) and
# "exact" (3-term bf16 split, ~2e-7, ~1.2x) remain. Config.warp_kernel
# selects; measured in benchmarks/check_pallas_warp_tpu.py.
CONST_SRC_PALLAS = True
CONST_SRC_MODE = "int8"


def set_const_src_pallas(enabled: bool, fast: bool = False,
                         mode: str | None = None) -> None:
    """Toggle the const-src Pallas warp path (Config.warp_kernel).

    ``mode``: "exact" | "bf16" | "int8" (see pallas/warp.py); ``fast``
    is the legacy boolean alias (True -> "bf16", False -> "exact")."""
    global CONST_SRC_PALLAS, CONST_SRC_MODE
    CONST_SRC_PALLAS = enabled
    CONST_SRC_MODE = mode if mode is not None else ("bf16" if fast else "exact")


def bilinear_sample(image: jnp.ndarray, pixel_coords: jnp.ndarray,
                    valid_mask: jnp.ndarray | None = None,
                    const_src: bool = False) -> jnp.ndarray:
    """Sample ``image`` at floating-point ``pixel_coords``.

    :param image: source images [batch, numsrc, height, width, channels]
    :param pixel_coords: (u, v[, 1]) [batch, numsrc, 2 or 3, height*width]
        pixel coordinates into the *source* image for every *target* pixel
    :param valid_mask: optional [batch, height, width, 1]; zero entries are
        invalid target pixels (e.g. zero-depth)
    :param const_src: promise that ``image`` is never differentiated
        (training data); enables the gather-free Pallas kernel on TPU
    :return: reconstructed target view [batch, numsrc, height, width, channels]
    """
    height, width, channels = image.shape[2], image.shape[3], image.shape[4]
    # every const-src warp the kernel supports routes to Pallas -- the
    # coarse scales too: measured b8n4 32x128 (scale 2 of the headline
    # config), the XLA one-hot costs 0.89 ms fwd / 4.3 ms fwd+grad vs
    # ~0.0 / 0.45 ms for the int8 kernel (benchmarks/probe_scale2_warp.py)
    if const_src and CONST_SRC_PALLAS and jax.default_backend() != "cpu":
        from xpt_mde_tpu.ops.pallas import warp as pallas_warp
        if pallas_warp.supported(image.shape, mode=CONST_SRC_MODE):
            return pallas_warp.bilinear_sample_const_src(
                image, pixel_coords, valid_mask, mode=CONST_SRC_MODE)
    ints, weights = _neighbor_weights(image, pixel_coords, valid_mask)
    if (height * width <= ONEHOT_MAX_PIXELS
            and channels <= ONEHOT_MAX_CHANNELS):
        return _sample_onehot(image, ints, weights)
    return _sample_patch_gather(image, ints, weights)
