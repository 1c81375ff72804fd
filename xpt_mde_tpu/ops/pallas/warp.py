"""Pallas TPU kernel: gather-free bilinear warp for constant source images.

The view-synthesis warp (reference semantics:
/root/reference/model/synthesize/bilinear_interp.py:34-147) samples the
*source image* — training data, never differentiated — at coordinates
produced by depth + pose reprojection. XLA lowers per-pixel sampling to
an HBM gather measured at ~14 ns/index on this chip regardless of
operand dtype (benchmarks/probe_gather.py): ~30 ms of an ~83 ms train
step. Mosaic's ``dynamic_gather`` is worse (~5 Gelem/s, 128-lane tables
only). This kernel does the sampling with NO gather at all:

  column select (MXU):  A[r, p] = sum_q img[r, q] * M_u[q, p]
      where M_u is an in-VMEM one-hot-with-weights matrix
      (w_u at u_f, 1-w_u at u_f+1) — a [W, NPIX] matmul per tile;
  row select (VPU):     out[p] = sum_r M_v[r, p] * A[r, p]
      with M_v carrying w_v at v_f, 1-w_v at v_f+1 and the validity.

The selection matrices are PURE one-hots (E_f at u_f, E_c at u_f+1) —
exact in bf16 AND int8 — and the f32 bilinear weights are applied on
the VPU after the matmuls, so the only rounding carrier is the image
operand. Modes (measured on v5e, 32 frames of 128x512x3, worst-case
off-grid images — benchmarks/check_pallas_warp_tpu.py):

  "int8"  (training default): quantize onto the uint8 pixel grid
          (img = u/127.5 - 1 <-> q = u - 128, an exact int8); the dots
          run int8 x int8 -> int32 at 2x the bf16 MXU rate and
          dequantize exactly. EXACT for values that came from uint8
          pixels (the unaugmented pipeline), <= 1/255 — half the uint8
          step — for augmented ones. fwd 6.4 ms.
  "bf16": one bf16 image term (~2e-3 on [-1,1] images), fwd 9.1 ms.
  "exact": three exact bf16 terms summing to all 24 f32 mantissa bits
          (~1e-7), fwd 26 ms. (Mosaic's Precision.HIGHEST dot measured
          5x slower than these single-pass splits.)
XLA patch-gather reference: 32 ms.

Exact bilinear semantics (clipped neighbors, ceil!=floor+1 -> invalid,
zero-depth mask, black invalid pixels) — same contract as
ops.warp.bilinear_sample, which stays the general differentiable
sampler and the semantic reference.

Training: a ``jax.custom_vjp`` whose forward also emits, per channel,
the row-selected values J_f/J_c (A at v_f / v_f+1) and the column
difference values D_f/D_c (rows v_f / v_f+1 of P_c - P_f — free, no
extra matmul). The backward pass is then pure elementwise XLA:

    d out/d u = valid * (w_v * D_f + (1-w_v) * D_c)
    d out/d v = valid * (J_c - J_f)

THE COTANGENT W.R.T. THE SOURCE IMAGE IS ZERO BY CONSTRUCTION — callers
must only use this op on images that are not differentiated (the
synthesis and flow-warp losses warp ``features["image5d"]``). That is
what makes the no-scatter backward possible.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# pixels per grid tile; 1024 keeps the one-hots at 1 MB bf16 and
# measured best on v5e (512 and 2048 within noise — tunable for other
# generations via XPT_WARP_NPIX)
_NPIX = int(os.environ.get("XPT_WARP_NPIX", "1024"))

VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def _dot1(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _split_img(img, mode):
    """Split a f32 image into exact bf16 terms (sum == img to f32).

    The selection matmuls run against PURE one-hot matrices (exact in
    bf16), so the image operand is the only precision carrier: 3 bf16
    terms reconstruct all 24 f32 mantissa bits (~1e-7 residual); bf16
    mode keeps one term (~2e-3 on [-1,1] images). bf16 storage keeps
    VMEM small and every dot a single-pass bf16 MXU op."""
    if mode == "bf16":
        return (img.astype(jnp.bfloat16),)
    h = img.astype(jnp.bfloat16)
    r = img - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return (h, m, l)


# int8 mode: quantize the [-1, 1] image onto the uint8 pixel grid
# (img = u/127.5 - 1  <->  q = u - 128, an exact int8). The one-hot
# dots then run as int8 x int8 -> int32 -- 2x the bf16 MXU rate on v5e
# -- and dequantize exactly: val = q/127.5 + 1/255. Images that came
# straight from uint8 pixels round EXACTLY (zero sampling error);
# augmented (off-grid) values carry <= 1/255 -- half the uint8
# quantization step the sources were stored with.
_INT8_SCALE = 1.0 / 127.5
_INT8_OFFSET = 1.0 / 255.0


def _quant_int8(img):
    """Quantize [-1, 1] floats onto the uint8 pixel grid (done OUTSIDE
    the kernel, once per frame -- the kernel sees int8 and the image
    VMEM block shrinks 4x, which is what lets the 256x1024 high-res
    frame fit)."""
    return jnp.clip(jnp.round((img + 1.0) * 127.5) - 128.0,
                    -128.0, 127.0).astype(jnp.int8)


def _dot_int8(q, onehot8):
    acc = jax.lax.dot_general(
        q, onehot8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * _INT8_SCALE + _INT8_OFFSET


def _dot_terms(img_terms, onehot):
    """sum_t term @ onehot — an exact (up to the split residual) MXU
    column-gather: every operand is exactly representable in bf16."""
    acc = _dot1(img_terms[0], onehot)
    for t in img_terms[1:]:
        acc = acc + _dot1(t, onehot)
    return acc


# stacked output slots: out, J_f, J_c, D_f, D_c
_SLOTS = 5


def _warp_kernel(img_ref, u_ref, v_ref, mask_ref, out_ref, *,
                 height, width, channels, use_mask, with_grads, mode):
    u = u_ref[0, 0]      # [1, NPIX]
    v = v_ref[0, 0]
    uf0 = jnp.floor(u)
    uc = jnp.clip(uf0 + 1.0, 0.0, width - 1)
    uf = jnp.clip(uf0, 0.0, width - 1)
    vf0 = jnp.floor(v)
    vc = jnp.clip(vf0 + 1.0, 0.0, height - 1)
    vf = jnp.clip(vf0, 0.0, height - 1)
    valid = (uf + 1.0 == uc) & (vf + 1.0 == vc)
    if use_mask:
        valid = valid & (mask_ref[0, 0] != 0)
    w_u = uc - u
    w_v = vc - v
    ufi = uf.astype(jnp.int32)
    vfi = vf.astype(jnp.int32)
    # PURE one-hot selection matrices (exact in bf16); the f32 bilinear
    # weights are applied on the VPU after the matmuls, so they carry no
    # rounding at all
    cols = jax.lax.broadcasted_iota(jnp.int32, (width, _NPIX), 0)
    onehot_dtype = jnp.int8 if mode == "int8" else jnp.bfloat16
    e_f = jnp.where(cols == ufi, 1, 0).astype(onehot_dtype)
    e_c = jnp.where(cols == ufi + 1, 1, 0).astype(onehot_dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (height, _NPIX), 0)
    mf = jnp.where(rows == vfi, 1.0, 0.0)
    mc = jnp.where(rows == vfi + 1, 1.0, 0.0)
    for c in range(channels):
        if mode == "int8":
            q = img_ref[0, c]                        # pre-quantized int8
            p_f = _dot_int8(q, e_f)                  # [H, NPIX] f32
            p_c = _dot_int8(q, e_c)
        else:
            img_terms = _split_img(img_ref[0, c].astype(jnp.float32), mode)
            p_f = _dot_terms(img_terms, e_f)         # [H, NPIX] f32
            p_c = _dot_terms(img_terms, e_c)
        a = w_u * p_f + (1.0 - w_u) * p_c
        j_f = jnp.sum(mf * a, axis=0)[None]
        j_c = jnp.sum(mc * a, axis=0)[None]
        out = jnp.where(valid, w_v * j_f + (1.0 - w_v) * j_c, 0.0)
        out_ref[0, c, 0, 0:1] = out
        if with_grads:
            d = p_c - p_f
            out_ref[0, c, 0, 1:2] = j_f
            out_ref[0, c, 0, 2:3] = j_c
            out_ref[0, c, 0, 3:4] = jnp.sum(mf * d, axis=0)[None]
            out_ref[0, c, 0, 4:5] = jnp.sum(mc * d, axis=0)[None]


def _prep(image, pixel_coords, valid_mask):
    batch, numsrc, height, width, channels = image.shape
    bn = batch * numsrc
    ntiles = height * width // _NPIX
    img_t = jnp.transpose(image, (0, 1, 4, 2, 3)).reshape(
        bn, channels, height, width)
    coords = pixel_coords.reshape(batch, numsrc, -1, height * width)
    u = coords[:, :, 0].reshape(bn, ntiles, 1, _NPIX)
    v = coords[:, :, 1].reshape(bn, ntiles, 1, _NPIX)
    if valid_mask is not None:
        # per-BATCH tiles; the kernel grid re-reads the same block for
        # every source via the index map (no numsrc-fold HBM copy)
        mask = valid_mask.reshape(batch, ntiles, 1, _NPIX) \
            .astype(jnp.float32)
    else:
        mask = jnp.zeros((batch, 1, 1, _NPIX), jnp.float32)
    return img_t, u, v, mask


@functools.lru_cache(maxsize=None)
def _warp_kernel_spmd(use_mask, with_grads, mode, interpret):
    """Batch-partitioned kernel call (see ops/pallas/spmd.py): under a
    data-sharded jit each device warps its local batch slice instead of
    GSPMD replicating the opaque custom call. The mask's leading dim is
    ``batch`` while the others carry ``batch * numsrc`` -- shards hold
    whole contiguous numsrc groups (DP divisibility), so the
    ``b // numsrc`` mask index map stays correct per shard."""
    from xpt_mde_tpu.ops.pallas.spmd import batch_partitioned

    def run(img_t, u, v, mask):
        bn, channels, height, width = img_t.shape
        numsrc = bn // mask.shape[0]
        ntiles = height * width // _NPIX
        kernel = functools.partial(
            _warp_kernel, height=height, width=width, channels=channels,
            use_mask=use_mask, with_grads=with_grads, mode=mode)
        slots = _SLOTS if with_grads else 1
        mask_spec = (pl.BlockSpec((1, 1, 1, _NPIX),
                                  lambda b, t: (b // numsrc, t, 0, 0))
                     if use_mask
                     else pl.BlockSpec((1, 1, 1, _NPIX),
                                       lambda b, t: (b // numsrc, 0, 0, 0)))
        # single stacked f32 output [bn, C, nt, slots, NPIX]: slot 0 is
        # the warped view; slots 1-4 (training) are J_f, J_c, D_f, D_c
        return pl.pallas_call(
            kernel,
            grid=(bn, ntiles),
            in_specs=[
                pl.BlockSpec((1, channels, height, width),
                             lambda b, t: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, 1, _NPIX), lambda b, t: (b, t, 0, 0)),
                pl.BlockSpec((1, 1, 1, _NPIX), lambda b, t: (b, t, 0, 0)),
                mask_spec,
            ],
            out_specs=pl.BlockSpec((1, channels, 1, slots, _NPIX),
                                   lambda b, t: (b, 0, t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (bn, channels, ntiles, slots, _NPIX), jnp.float32),
            interpret=interpret,
        )(img_t, u, v, mask)

    return batch_partitioned(run)


def _call_kernel(image, pixel_coords, valid_mask, with_grads, mode,
                 interpret):
    use_mask = valid_mask is not None
    img_t, u, v, mask = _prep(image, pixel_coords, valid_mask)
    if mode == "int8":
        img_t = _quant_int8(img_t.astype(jnp.float32))
    slots = _SLOTS if with_grads else 1
    out = _warp_kernel_spmd(use_mask, with_grads, mode, interpret)(
        img_t, u, v, mask)
    return [out[:, :, :, k] for k in range(slots)]


def _to_bnhwc(x, batch, numsrc, height, width):
    bn, channels = x.shape[0], x.shape[1]
    return jnp.transpose(
        x.reshape(batch, numsrc, channels, height, width), (0, 1, 3, 4, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _warp_const(image, pixel_coords, mask_arg, use_mask, mode, interpret):
    out, = _call_kernel(image, pixel_coords,
                        mask_arg if use_mask else None,
                        with_grads=False, mode=mode, interpret=interpret)
    b, n, h, w, _ = image.shape
    return _to_bnhwc(out, b, n, h, w).astype(image.dtype)


def _warp_const_fwd(image, pixel_coords, mask_arg, use_mask, mode,
                    interpret):
    outs = _call_kernel(image, pixel_coords,
                        mask_arg if use_mask else None,
                        with_grads=True, mode=mode, interpret=interpret)
    out, j_f, j_c, d_f, d_c = outs
    b, n, h, w, _ = image.shape
    res = (tuple(_to_bnhwc(x, b, n, h, w) for x in (j_f, j_c, d_f, d_c)),
           pixel_coords, mask_arg,
           jax.ShapeDtypeStruct(image.shape, image.dtype))
    return _to_bnhwc(out, b, n, h, w).astype(image.dtype), res


def _warp_const_bwd(use_mask, mode, interpret, res, g):
    (j_f, j_c, d_f, d_c), pixel_coords, mask_arg, img_sd = res
    batch, numsrc, height, width, _ = img_sd.shape
    hw = height * width
    u = pixel_coords[:, :, 0]
    v = pixel_coords[:, :, 1]
    uf0 = jnp.floor(u)
    uc = jnp.clip(uf0 + 1.0, 0.0, width - 1)
    uf = jnp.clip(uf0, 0.0, width - 1)
    vf0 = jnp.floor(v)
    vc = jnp.clip(vf0 + 1.0, 0.0, height - 1)
    vf = jnp.clip(vf0, 0.0, height - 1)
    valid = (uf + 1.0 == uc) & (vf + 1.0 == vc)
    if use_mask:
        valid = valid & (mask_arg.reshape(batch, 1, hw) != 0)
    valid = valid.astype(jnp.float32)           # [B, N, HW]
    w_v = (vc - v).reshape(batch, numsrc, height, width, 1)
    g32 = g.astype(jnp.float32)
    du = jnp.sum(g32 * (w_v * d_f + (1.0 - w_v) * d_c), axis=-1)
    dv = jnp.sum(g32 * (j_c - j_f), axis=-1)    # [B, N, H, W]
    du = (du.reshape(batch, numsrc, hw) * valid)[:, :, None]
    dv = (dv.reshape(batch, numsrc, hw) * valid)[:, :, None]
    dcoords = jnp.concatenate([du, dv], axis=2)
    if pixel_coords.shape[2] > 2:  # homogeneous row: no gradient
        dcoords = jnp.concatenate([dcoords, jnp.zeros_like(du)], axis=2)
    dimage = jnp.zeros(img_sd.shape, img_sd.dtype)
    dmask = jnp.zeros_like(mask_arg)
    return dimage, dcoords.astype(pixel_coords.dtype), dmask


_warp_const.defvjp(_warp_const_fwd, _warp_const_bwd)


def bilinear_sample_const_src(image: jnp.ndarray,
                              pixel_coords: jnp.ndarray,
                              valid_mask: jnp.ndarray | None = None,
                              fast: bool = False,
                              mode: str | None = None,
                              interpret: bool = False) -> jnp.ndarray:
    """Gather-free Pallas twin of ops.warp.bilinear_sample for source
    images that are NOT differentiated (zero image cotangent).

    :param image: [batch, numsrc, height, width, channels]
    :param pixel_coords: (u, v[, 1]) [batch, numsrc, 2 or 3, height*width]
    :param valid_mask: optional [batch, height, width, 1]; zero = invalid
    :param fast: legacy alias for mode="bf16"
    :param mode: image-operand precision for the one-hot MXU dots:
        "exact" (3-term bf16 split, ~1e-7), "bf16" (single term, ~2e-3),
        "int8" (uint8-grid quantization: EXACT for values on the uint8
        pixel grid, <= 1/255 otherwise, at 2x the bf16 MXU rate)
    :return: [batch, numsrc, height, width, channels]
    """
    if mode is None:
        mode = "bf16" if fast else "exact"
    assert mode in ("exact", "bf16", "int8"), mode
    use_mask = valid_mask is not None
    mask_arg = (valid_mask if use_mask
                else jnp.zeros((image.shape[0], image.shape[2],
                                image.shape[3], 1), jnp.float32))
    return _warp_const(image, pixel_coords, mask_arg, use_mask, mode,
                       interpret)


def _vmem_bytes(height, width, channels, mode="bf16"):
    if mode == "int8":
        # int8 frame + int8 one-hots + f32 P_f/P_c + f32 row masks
        # + the column iota ([W, NPIX] i32)
        return (channels * height * width
                + 2 * width * _NPIX
                + 2 * height * _NPIX * 4
                + 2 * height * _NPIX * 4
                + max(height, width) * _NPIX * 4)
    # f32 frame + M_u/M_du + A/D + masks/temps, all f32
    return (channels * height * width * 4
            + 2 * width * _NPIX * 4
            + 2 * height * _NPIX * 4
            + 3 * max(height, width) * _NPIX * 4)


def supported(image_shape, fast: bool = False, mode: str = "bf16") -> bool:
    """Whether the kernel handles this shape within VMEM and the matmul
    formulation is profitable. The matmul cost per output pixel grows
    with H*W (2 dots over the full frame width): in bf16, the high-res
    256x1024 full scale (~64 ms of MACs vs ~59 ms of gather) stays on
    the XLA path and every scale at or below 128x512 wins clearly. The
    int8 mode doubles the MXU rate AND shrinks the frame block 4x, so
    high-res fits in VMEM and beats the gather (measured v5e, b4x4:
    fwd 34.5 ms vs 64.5 ms, train fwd+grad 40.9 ms vs 60.5 ms) -- the
    cap extends to 256x1024x3."""
    _, _, height, width, channels = image_shape
    del fast
    if (height * width) % _NPIX or width % 128 or height % 8:
        return False
    if _vmem_bytes(height, width, channels, mode) > VMEM_LIMIT_BYTES:
        return False
    cap = 256 * 1024 * 3 if mode == "int8" else 128 * 512 * 3
    return height * width * channels <= cap
