"""Correlation cost volume (PWC-Net / FlowNet style), TPU-native.

Replaces the CUDA custom op the reference depends on
(tfa.layers.CorrelationCost, /root/reference/model/build_model/
flow_net.py:159-174): for every pixel, the channel-mean dot product of
the left feature with the right feature displaced by every (dy, dx) in a
[-md, md] grid subsampled by ``stride``:

    corr[b, y, x, k] = mean_c( cl[b, y, x, c] * cr[b, y+dy_k, x+dx_k, c] )

XLA formulation: pad the right features and unroll the (2*md/stride+1)^2
static displacement loop into fused multiply-reduce ops -- displacement
counts here are <= 81, and XLA fuses each slice*mul*mean into one pass.
A Pallas kernel (ops/pallas) can replace this on the training hot path;
semantics are identical.
"""

from __future__ import annotations

import jax.numpy as jnp


def correlation_cost(cl: jnp.ndarray, cr: jnp.ndarray, max_displacement: int,
                     stride: int = 1) -> jnp.ndarray:
    """
    :param cl: left features [batch, height, width, channels]
    :param cr: right features [batch, height, width, channels]
    :param max_displacement: max displacement in pixels (md)
    :param stride: displacement-grid stride (tfa's stride_2)
    :return: [batch, height, width, (2*md//stride+1)^2]
    """
    batch, height, width, channels = cl.shape
    md = max_displacement
    offsets = list(range(-md, md + 1, stride))
    cr_pad = jnp.pad(cr, ((0, 0), (md, md), (md, md), (0, 0)))
    slices = []
    for dy in offsets:
        for dx in offsets:
            win = cr_pad[:, md + dy: md + dy + height,
                         md + dx: md + dx + width, :]
            slices.append(jnp.mean(cl * win, axis=-1))
    return jnp.stack(slices, axis=-1)


def correlation_channels(max_displacement: int, stride: int = 1) -> int:
    return (2 * (max_displacement // stride) + 1) ** 2 if stride == 1 else \
        len(range(-max_displacement, max_displacement + 1, stride)) ** 2
