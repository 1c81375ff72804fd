"""Pallas TPU kernel: correlation cost volume (PWC-Net), with custom VJP.

Replaces the reference's CUDA CorrelationCost dependency
(/root/reference/model/build_model/flow_net.py:159-174) with an on-chip
kernel. Per grid step (one batch element), the left block and the padded
right block live in VMEM; the displacement loop is a static unroll of
elementwise multiply + channel-mean (VPU), writing the [H, W, D^2]
volume without materializing D^2 HBM-sized intermediates like the
XLA-level formulation in ops/correlation.py does.

Training support: ``correlation_cost_pallas`` carries a ``jax.custom_vjp``
whose backward pass is two more correlation-like Pallas kernels —

    dcl[y, x, c]  = 1/C * sum_k g[y, x, k]           * cr[y+dy_k, x+dx_k, c]
    dcr[y', x', c] = 1/C * sum_k g[y'-dy_k, x'-dx_k, k] * cl[y'-dy_k, x'-dx_k, c]

(the dcr form is computed by padding g and cl once in XLA and sliding the
window the other way, so the kernel writes an unpadded [H, W, C] block).

VMEM safety: the BlockSpecs keep whole padded frames per grid step, which
is fine at the PWC pyramid levels benchmarked but can overflow the ~16 MB
VMEM at high-res fine levels. ``correlation_cost_pallas`` therefore
estimates the worst-case block residency and falls back to the XLA
formulation (ops/correlation.correlation_cost, whose autodiff is native)
when the estimate exceeds ``VMEM_LIMIT_BYTES``.

The jnp twin (ops/correlation.correlation_cost) defines the semantics;
tests assert bit-level equivalence (values and grads) in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# leave headroom below the ~16 MB/core VMEM for compiler temporaries
VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def _corr_kernel(cl_ref, cr_pad_ref, out_ref, *, offsets, height, width,
                 channels):
    """Channel-FIRST layout: cl [1,C,H,W], cr_pad [1,C,H+2md,W+2md],
    out [1,n_out,H,W]. W rides the 128-lane dim and each displacement
    writes a whole [H, W] plane (the channel-last variant stored one lane
    per displacement -- measured 2.8x slower than XLA; this one is not).
    The channel reduction runs over the leading dim: cheap sublane adds.
    """
    cl = cl_ref[0].astype(jnp.float32)  # [C, H, W]
    md = max(abs(o) for o in offsets) if offsets else 0
    k = 0
    for dy in offsets:
        for dx in offsets:
            win = cr_pad_ref[0, :, md + dy: md + dy + height,
                             md + dx: md + dx + width].astype(jnp.float32)
            out_ref[0, k] = (jnp.sum(cl * win, axis=0)
                             / channels).astype(out_ref.dtype)
            k += 1


def _corr_grad_cl_kernel(g_ref, cr_pad_ref, out_ref, *, offsets, height,
                         width, channels):
    """dcl[c] = 1/C * sum_k g[k] * shifted(cr)[c]; all channel-first."""
    md = max(abs(o) for o in offsets) if offsets else 0
    acc = jnp.zeros((channels, height, width), jnp.float32)
    k = 0
    for dy in offsets:
        for dx in offsets:
            win = cr_pad_ref[0, :, md + dy: md + dy + height,
                             md + dx: md + dx + width]
            acc += g_ref[0, k][None].astype(jnp.float32) \
                * win.astype(jnp.float32)
            k += 1
    out_ref[0] = (acc / channels).astype(out_ref.dtype)


def _corr_grad_cr_kernel(g_pad_ref, cl_pad_ref, out_ref, *, offsets, height,
                         width, channels):
    """dcr[c,u,v] = 1/C * sum_k (g[k]*cl[c])[u-dy_k, v-dx_k].

    g and cl arrive padded by md so every backward shift is a static
    in-bounds slice (pad-of-product == product-of-pads). Channel-first.
    """
    md = max(abs(o) for o in offsets) if offsets else 0
    acc = jnp.zeros((channels, height, width), jnp.float32)
    k = 0
    for dy in offsets:
        for dx in offsets:
            gwin = g_pad_ref[0, k, md - dy: md - dy + height,
                             md - dx: md - dx + width]
            clwin = cl_pad_ref[0, :, md - dy: md - dy + height,
                               md - dx: md - dx + width]
            acc += gwin[None].astype(jnp.float32) \
                * clwin.astype(jnp.float32)
            k += 1
    out_ref[0] = (acc / channels).astype(out_ref.dtype)


def _frame_specs(shapes):
    """One whole [1, *shape] frame per grid step, resident in VMEM."""
    return [pl.BlockSpec((1,) + tuple(shape),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
            for shape in shapes]


def _corr_forward(cl, cr, offsets, interpret):
    batch, height, width, channels = cl.shape
    md = max(abs(o) for o in offsets) if offsets else 0
    n_out = len(offsets) ** 2
    clf = jnp.transpose(cl, (0, 3, 1, 2))  # [B, C, H, W]
    crf = jnp.transpose(cr, (0, 3, 1, 2))
    cr_pad = jnp.pad(crf, ((0, 0), (0, 0), (md, md), (md, md)))
    kernel = functools.partial(_corr_kernel, offsets=offsets, height=height,
                               width=width, channels=channels)
    out = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=_frame_specs([clf.shape[1:], cr_pad.shape[1:]]),
        out_specs=_frame_specs([(n_out, height, width)])[0],
        out_shape=jax.ShapeDtypeStruct((batch, n_out, height, width),
                                       cl.dtype),
        interpret=interpret,
    )(clf, cr_pad)
    return jnp.transpose(out, (0, 2, 3, 1))  # [B, H, W, n_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _corr_pallas(cl, cr, offsets, interpret):
    return _corr_forward(cl, cr, offsets, interpret)


def _corr_pallas_fwd(cl, cr, offsets, interpret):
    return _corr_forward(cl, cr, offsets, interpret), (cl, cr)


def _corr_pallas_bwd(offsets, interpret, residuals, g):
    cl, cr = residuals
    batch, height, width, channels = cl.shape
    md = max(abs(o) for o in offsets) if offsets else 0
    pad = ((0, 0), (0, 0), (md, md), (md, md))  # channel-first pad

    clf = jnp.transpose(cl, (0, 3, 1, 2))  # [B, C, H, W]
    crf = jnp.transpose(cr, (0, 3, 1, 2))
    gf = jnp.transpose(g, (0, 3, 1, 2))    # [B, n_out, H, W]

    cl_kernel = functools.partial(_corr_grad_cl_kernel, offsets=offsets,
                                  height=height, width=width,
                                  channels=channels)
    cr_pad = jnp.pad(crf, pad)
    dcl = pl.pallas_call(
        cl_kernel,
        grid=(batch,),
        in_specs=_frame_specs([gf.shape[1:], cr_pad.shape[1:]]),
        out_specs=_frame_specs([clf.shape[1:]])[0],
        out_shape=jax.ShapeDtypeStruct(clf.shape, cl.dtype),
        interpret=interpret,
    )(gf, cr_pad)

    cr_kernel = functools.partial(_corr_grad_cr_kernel, offsets=offsets,
                                  height=height, width=width,
                                  channels=channels)
    g_pad = jnp.pad(gf, pad)
    cl_pad = jnp.pad(clf, pad)
    dcr = pl.pallas_call(
        cr_kernel,
        grid=(batch,),
        in_specs=_frame_specs([g_pad.shape[1:], cl_pad.shape[1:]]),
        out_specs=_frame_specs([crf.shape[1:]])[0],
        out_shape=jax.ShapeDtypeStruct(crf.shape, cr.dtype),
        interpret=interpret,
    )(g_pad, cl_pad)
    return (jnp.transpose(dcl, (0, 2, 3, 1)),
            jnp.transpose(dcr, (0, 2, 3, 1)))


_corr_pallas.defvjp(_corr_pallas_fwd, _corr_pallas_bwd)


def _vmem_estimate_bytes(shape, max_displacement, stride, dtype) -> int:
    """Worst-case per-grid-step VMEM residency across fwd + bwd kernels."""
    _, height, width, channels = shape
    md = max_displacement
    n_out = len(range(-md, md + 1, stride)) ** 2
    itemsize = jnp.dtype(dtype).itemsize
    frame = height * width
    padded = (height + 2 * md) * (width + 2 * md)
    # every kernel also keeps a full-frame f32 working set: fwd upcasts
    # cl once ([C,H,W] f32), both backward kernels hold a [C,H,W] f32
    # accumulator live across the unrolled displacement loop
    f32_cl = frame * channels * 4
    fwd = (frame * channels + padded * channels + frame * n_out) * itemsize \
        + f32_cl
    bwd_cl = (frame * n_out + padded * channels + frame * channels) \
        * itemsize + f32_cl
    bwd_cr = (padded * n_out + padded * channels) * itemsize \
        + frame * channels * (itemsize + 4)
    return max(fwd, bwd_cl, bwd_cr)


def correlation_cost_pallas(cl: jnp.ndarray, cr: jnp.ndarray,
                            max_displacement: int, stride: int = 1,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas twin of ops.correlation.correlation_cost.

    Differentiable (custom VJP, two Pallas backward kernels). Falls back
    to the XLA formulation when the per-frame blocks would not fit VMEM.

    :param cl, cr: [batch, height, width, channels]
    :return: [batch, height, width, n_disp^2]
    """
    md = max_displacement
    if not interpret and _vmem_estimate_bytes(cl.shape, md, stride,
                                              cl.dtype) > VMEM_LIMIT_BYTES:
        from xpt_mde_tpu.ops.correlation import correlation_cost
        return correlation_cost(cl, cr, md, stride)
    offsets = tuple(range(-md, md + 1, stride))
    return _corr_pallas(cl, cr, offsets, interpret)
