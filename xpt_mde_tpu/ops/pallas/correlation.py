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

VMEM safety: the forward keeps whole padded frames per grid step; the
backward kernels grid over (batch, dy-row) with an f32 scratch accumulated
across rows, bounding the live displacement windows to one row (a full
81-displacement unroll measured 68.8 MB of Mosaic scoped stack at the
level-2 PWC shape). Residency estimates gate each direction separately:
an oversized forward falls back to the XLA formulation wholesale, an
oversized backward alone falls back to the XLA formulation's native
gradient while the forward stays on the kernel.

The jnp twin (ops/correlation.correlation_cost) defines the semantics;
tests assert bit-level equivalence (values and grads) in interpreter mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# leave headroom below the ~16 MB/core VMEM for compiler temporaries
VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def _pallas_pays(shape) -> bool:
    """Measured per-shape choice (benchmarks/probe_corr_route.py, v5e).

    The coarse PWC levels invert: at [32,2,8,196] (level 6) and
    [32,4,16,128] (level 5, 128x512 inputs) the XLA formulation is
    5-100x faster fwd AND bwd -- the kernel's [H, W] displacement
    planes occupy single-digit cells of the 8x128 VPU tile and its
    channel reduction serializes over such tiles. From [8,32] spatial
    up the kernel wins by 2-8x fwd (L2 is mixed: XLA 1.5x faster
    forward-only, the kernel 1.2x faster fwd+bwd -- kept on the
    kernel). Override with XPT_CORR_MODE=pallas|xla.
    """
    mode = os.environ.get("XPT_CORR_MODE", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    _, height, width, _ = shape
    return height * width > 64


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


def _corr_grad_cl_kernel(g_ref, cr_rows_ref, out_ref, acc_ref, *, offsets,
                         height, width, channels):
    """dcl[c] = 1/C * sum_k g[k] * shifted(cr)[c]; all channel-first.

    Gridded over (batch, dy-row): a fully unrolled 81-displacement loop
    keeps every windowed product live at once and blows Mosaic's scoped
    VMEM stack (measured 68.8 MB at the level-2 PWC shape). One dy row
    per grid step bounds the live set to n windows; the f32 scratch
    accumulates across the arbitrary dy dimension. The dy shift arrives
    pre-sliced from XLA (cr_rows block j = the dy_j row window), so the
    kernel body only takes STATIC dx lane slices -- Mosaic cannot prove
    alignment of dynamic sublane starts (and stride<8 levels genuinely
    aren't aligned).
    """
    md = max(abs(o) for o in offsets) if offsets else 0
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for i, dx in enumerate(offsets):
        win = cr_rows_ref[0, 0, :, :, md + dx: md + dx + width]
        acc_ref[...] += g_ref[0, i][None].astype(jnp.float32) \
            * win.astype(jnp.float32)

    @pl.when(j == len(offsets) - 1)
    def _flush():
        out_ref[0] = (acc_ref[...] / channels).astype(out_ref.dtype)


def _corr_grad_cr_kernel(g_rows_ref, cl_rows_ref, out_ref, acc_ref, *,
                         offsets, height, width, channels):
    """dcr[c,u,v] = 1/C * sum_k (g[k]*cl[c])[u-dy_k, v-dx_k].

    g and cl arrive as pre-sliced dy-row windows of their md-padded
    frames (pad-of-product == product-of-pads), so every backward shift
    is a static lane slice. Channel-first, gridded over (batch, dy-row)
    with an f32 scratch accumulator -- see _corr_grad_cl_kernel for why.
    """
    md = max(abs(o) for o in offsets) if offsets else 0
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for i, dx in enumerate(offsets):
        gwin = g_rows_ref[0, 0, i, :, md - dx: md - dx + width]
        clwin = cl_rows_ref[0, 0, :, :, md - dx: md - dx + width]
        acc_ref[...] += gwin[None].astype(jnp.float32) \
            * clwin.astype(jnp.float32)

    @pl.when(j == len(offsets) - 1)
    def _flush():
        out_ref[0] = (acc_ref[...] / channels).astype(out_ref.dtype)


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


@functools.lru_cache(maxsize=None)
def _corr_forward_spmd(offsets, interpret):
    """Batch-partitioned forward (see ops/pallas/spmd.py): under a
    data-sharded jit each device runs the kernel on its local batch
    slice instead of GSPMD replicating the opaque custom call."""
    from xpt_mde_tpu.ops.pallas.spmd import batch_partitioned
    return batch_partitioned(
        lambda cl, cr: _corr_forward(cl, cr, offsets, interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _corr_pallas(cl, cr, offsets, interpret):
    return _corr_forward_spmd(offsets, interpret)(cl, cr)


def _corr_pallas_fwd(cl, cr, offsets, interpret):
    return _corr_forward_spmd(offsets, interpret)(cl, cr), (cl, cr)


@functools.lru_cache(maxsize=None)
def _bwd_dcl_spmd(offsets, interpret, dtype_name):
    """Batch-partitioned dcl kernel call: gf [B,n_out,H,W] +
    cr_rows [B,n,C,H,Wp] -> dcl (channel-first [B,C,H,W])."""
    from xpt_mde_tpu.ops.pallas.spmd import batch_partitioned

    def run(gf, cr_rows):
        batch, _, height, width = gf.shape
        _, n, channels, _, wp = cr_rows.shape
        kernel = functools.partial(_corr_grad_cl_kernel, offsets=offsets,
                                   height=height, width=width,
                                   channels=channels)
        params = pltpu.CompilerParams(dimension_semantics=(
            pltpu.GridDimensionSemantics.PARALLEL,
            pltpu.GridDimensionSemantics.ARBITRARY))
        return pl.pallas_call(
            kernel,
            grid=(batch, n),
            in_specs=[
                pl.BlockSpec((1, n, height, width),
                             lambda b, j: (b, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, channels, height, wp),
                             lambda b, j: (b, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, channels, height, width),
                                   lambda b, j: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (batch, channels, height, width), jnp.dtype(dtype_name)),
            scratch_shapes=[pltpu.VMEM((channels, height, width),
                                       jnp.float32)],
            compiler_params=params,
            interpret=interpret,
        )(gf, cr_rows)

    return batch_partitioned(run)


@functools.lru_cache(maxsize=None)
def _bwd_dcr_spmd(offsets, interpret, dtype_name):
    """Batch-partitioned dcr kernel call: g_rows [B,n,n,H,Wp] +
    cl_rows [B,n,C,H,Wp] -> dcr (channel-first [B,C,H,W])."""
    from xpt_mde_tpu.ops.pallas.spmd import batch_partitioned
    md = max(abs(o) for o in offsets) if offsets else 0

    def run(g_rows, cl_rows):
        batch, n, channels, height, wp = cl_rows.shape
        width = wp - 2 * md
        kernel = functools.partial(_corr_grad_cr_kernel, offsets=offsets,
                                   height=height, width=width,
                                   channels=channels)
        params = pltpu.CompilerParams(dimension_semantics=(
            pltpu.GridDimensionSemantics.PARALLEL,
            pltpu.GridDimensionSemantics.ARBITRARY))
        return pl.pallas_call(
            kernel,
            grid=(batch, n),
            in_specs=[
                pl.BlockSpec((1, 1, n, height, wp),
                             lambda b, j: (b, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, channels, height, wp),
                             lambda b, j: (b, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, channels, height, width),
                                   lambda b, j: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (batch, channels, height, width), jnp.dtype(dtype_name)),
            scratch_shapes=[pltpu.VMEM((channels, height, width),
                                       jnp.float32)],
            compiler_params=params,
            interpret=interpret,
        )(g_rows, cl_rows)

    return batch_partitioned(run)


def _corr_pallas_bwd(offsets, interpret, residuals, g):
    cl, cr = residuals
    batch, height, width, channels = cl.shape
    md = max(abs(o) for o in offsets) if offsets else 0
    n = len(offsets)
    stride = offsets[1] - offsets[0] if n > 1 else 1

    if not interpret and _vmem_bwd_estimate_bytes(
            cl.shape, md, stride, cl.dtype) > VMEM_LIMIT_BYTES:
        # per-row blocks still too big (high-res fine levels): take the
        # XLA formulation's native gradient instead; the forward stays
        # on the Pallas kernel
        from xpt_mde_tpu.ops.correlation import correlation_cost
        _, vjp = jax.vjp(
            lambda a, b: correlation_cost(a, b, md, stride), cl, cr)
        return vjp(g)

    pad = ((0, 0), (0, 0), (md, md), (md, md))  # channel-first pad
    clf = jnp.transpose(cl, (0, 3, 1, 2))  # [B, C, H, W]
    crf = jnp.transpose(cr, (0, 3, 1, 2))
    gf = jnp.transpose(g, (0, 3, 1, 2))    # [B, n_out, H, W]

    def rows(x_pad, starts):
        # [B, D, Hp, Wp] -> [B, n, D, H, Wp]: the dy_j row window per j,
        # sliced statically in XLA so the kernel never indexes sublanes
        # dynamically
        return jnp.stack([x_pad[:, :, s: s + height] for s in starts],
                         axis=1)

    cr_pad = jnp.pad(crf, pad)
    # dcl sums g[k] * cr shifted by +offset: row j starts at md+offsets[j]
    cr_rows = rows(cr_pad, [md + o for o in offsets])
    dcl = _bwd_dcl_spmd(offsets, interpret, cl.dtype.name)(gf, cr_rows)

    # dcr sums (g[k] * cl) shifted by -offset: row j starts at
    # md-offsets[j]; g rows are grouped [j, i] = displacement j*n+i
    bwd_starts = [md - o for o in offsets]
    g_pad = jnp.pad(gf, pad)  # [B, n_out, Hp, Wp]
    g_rows = jnp.stack(
        [g_pad[:, j * n: (j + 1) * n,
               bwd_starts[j]: bwd_starts[j] + height]
         for j in range(n)], axis=1)  # [B, n, n, H, Wp]
    cl_rows = rows(jnp.pad(clf, pad), bwd_starts)
    dcr = _bwd_dcr_spmd(offsets, interpret, cr.dtype.name)(g_rows, cl_rows)
    return (jnp.transpose(dcl, (0, 2, 3, 1)),
            jnp.transpose(dcr, (0, 2, 3, 1)))


_corr_pallas.defvjp(_corr_pallas_fwd, _corr_pallas_bwd)


def _vmem_fwd_estimate_bytes(shape, max_displacement, stride, dtype) -> int:
    """Per-grid-step VMEM residency of the forward kernel."""
    _, height, width, channels = shape
    md = max_displacement
    n_out = len(range(-md, md + 1, stride)) ** 2
    itemsize = jnp.dtype(dtype).itemsize
    frame = height * width
    padded = (height + 2 * md) * (width + 2 * md)
    # the kernel upcasts cl once ([C,H,W] f32); per-displacement windows
    # are written straight to independent out planes, so Mosaic reuses
    # their registers (measured: compiles at every PWC level in use)
    f32_cl = frame * channels * 4
    return (frame * channels + padded * channels + frame * n_out) * itemsize \
        + f32_cl


def _vmem_bwd_estimate_bytes(shape, max_displacement, stride, dtype) -> int:
    """Per-grid-step VMEM residency of the (batch, dy-row) backward
    kernels. Mosaic keeps each unrolled dx window's f32 product live
    across the row (measured with the old full-unroll kernels: 81 live
    products = 68.8 MB of scoped stack), so the model charges n f32
    frames on top of the blocks + the scratch accumulator."""
    _, height, width, channels = shape
    md = max_displacement
    n = len(range(-md, md + 1, stride))
    itemsize = jnp.dtype(dtype).itemsize
    frame = height * width
    row_win = height * (width + 2 * md)  # one pre-sliced dy row window
    f32_frame = frame * channels * 4
    # scratch + out block + n live dx products
    live = f32_frame * (2 + n) + frame * channels * itemsize
    bwd_cl = (frame * n + row_win * channels) * itemsize + live
    bwd_cr = (row_win * n + row_win * channels) * itemsize + live
    return max(bwd_cl, bwd_cr)


def correlation_cost_pallas(cl: jnp.ndarray, cr: jnp.ndarray,
                            max_displacement: int, stride: int = 1,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas twin of ops.correlation.correlation_cost.

    Differentiable (custom VJP, two Pallas backward kernels gridded over
    (batch, dy-row)). Two gates route to the XLA formulation wholesale:
    a perf route for tiny spatial planes where the kernel is
    latency-bound (``_pallas_pays``), and a VMEM gate when the FORWARD
    frame blocks would not fit; additionally the backward alone falls
    back to the XLA formulation's native gradient when its row blocks
    would not fit (so forward-only uses -- frozen flownet, predict --
    keep the kernel at shapes whose backward is too big).

    :param cl, cr: [batch, height, width, channels]
    :return: [batch, height, width, n_disp^2]
    """
    md = max_displacement
    if not interpret and (
            not _pallas_pays(cl.shape)
            or _vmem_fwd_estimate_bytes(cl.shape, md, stride,
                                        cl.dtype) > VMEM_LIMIT_BYTES):
        from xpt_mde_tpu.ops.correlation import correlation_cost
        return correlation_cost(cl, cr, md, stride)
    offsets = tuple(range(-md, md + 1, stride))
    return _corr_pallas(cl, cr, offsets, interpret)
