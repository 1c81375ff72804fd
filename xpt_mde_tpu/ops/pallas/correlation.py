"""Pallas TPU kernel: correlation cost volume (PWC-Net).

Replaces the reference's CUDA CorrelationCost dependency
(/root/reference/model/build_model/flow_net.py:159-174) with an on-chip
kernel. Per grid step (one batch element), the left block and the padded
right block live in VMEM; the displacement loop is a static unroll of
elementwise multiply + channel-mean (VPU), writing the [H, W, D^2]
volume without materializing D^2 HBM-sized intermediates like the
XLA-level formulation in ops/correlation.py does.

The jnp twin (ops/correlation.correlation_cost) defines the semantics;
tests assert bit-level equivalence in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(cl_ref, cr_pad_ref, out_ref, *, offsets, height, width,
                 channels):
    cl = cl_ref[0]  # [H, W, C]
    md = max(abs(o) for o in offsets) if offsets else 0
    k = 0
    for dy in offsets:
        for dx in offsets:
            win = cr_pad_ref[0, md + dy: md + dy + height,
                             md + dx: md + dx + width, :]
            out_ref[0, :, :, k] = jnp.mean(cl * win, axis=-1)
            k += 1


def correlation_cost_pallas(cl: jnp.ndarray, cr: jnp.ndarray,
                            max_displacement: int, stride: int = 1,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas twin of ops.correlation.correlation_cost.

    :param cl, cr: [batch, height, width, channels]
    :return: [batch, height, width, n_disp^2]
    """
    batch, height, width, channels = cl.shape
    md = max_displacement
    offsets = tuple(range(-md, md + 1, stride))
    n_out = len(offsets) ** 2
    cr_pad = jnp.pad(cr, ((0, 0), (md, md), (md, md), (0, 0)))

    kernel = functools.partial(_corr_kernel, offsets=offsets, height=height,
                               width=width, channels=channels)
    return pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, height, width, channels),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, height + 2 * md, width + 2 * md, channels),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, height, width, n_out),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, height, width, n_out),
                                       cl.dtype),
        interpret=interpret,
    )(cl, cr_pad)
