"""Probe: space-to-depth packed PWC encoder early levels.

The PWC encoder's level-1/2 convs (C=16 @ 64x256, C=32 @ 32x128 for
128x512 inputs) are lane-starved: C-minor layouts pad the channel dim to
128 lanes. The packed-decoder trick (models/layers.py PackedConv2D)
should extend: space-to-depth the input once, run the stride-2 convs as
stride-2 packed convs (kernel lift u = 2s + di - 2oi below), run the
stride-1 convs as PackedConv2D, and depth-to-space only at level 2 whose
features feed correlation. Level-1 features are never consumed unpacked
(flow_net.py uses feats[1:]), so level 1 never unpacks.

Measures plain vs packed L1+L2 encoder slices, fwd and fwd+bwd, at the
joint-stage batch (32 = b8 x 4 sources). Run on the TPU:

    python benchmarks/probe_packed_pwc.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from kernel_bench import timeit

from xpt_mde_tpu.models.layers import (depth_to_space, pack_conv_kernel,
                                       space_to_depth)

DTYPE = jnp.bfloat16


def _pack_placement_s2():
    """Static tap tables for the STRIDE-2 kernel lift: fine-grid
    out[r] = sum_u w[u] in[2r+u] (TF SAME, even input: pad (0,1));
    packed out row (I, oi) = fine 2I+oi reads fine rows 4I+2oi+u ->
    packed rows 2I+s with sub-offset di where u = 2s + di - 2oi."""
    idx = np.zeros((3, 3, 4, 4), np.int32)
    msk = np.zeros((3, 3, 4, 4), np.float32)
    for s in range(3):
        for t in range(3):
            for di in range(2):
                for dj in range(2):
                    for oi in range(2):
                        for oj in range(2):
                            u = 2 * s + di - 2 * oi
                            v = 2 * t + dj - 2 * oj
                            if 0 <= u <= 2 and 0 <= v <= 2:
                                ib, ob = di * 2 + dj, oi * 2 + oj
                                idx[s, t, ib, ob] = u * 3 + v
                                msk[s, t, ib, ob] = 1.0
    return idx, msk


_S2_IDX, _S2_MASK = _pack_placement_s2()


def pack_conv_kernel_s2(w):
    """Lift a 3x3 STRIDE-2 SAME conv kernel [3,3,Cin,Cout] to packed
    domain [3,3,4Cin,4Cout]: conv_s2(x, w) == packed_conv_s2(s2d(x), wp)
    with packed padding ((0,1),(0,1)), output itself packed."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    taps = w.reshape(9, cin, cout)[_S2_IDX]
    taps = taps * jnp.asarray(_S2_MASK, w.dtype)[..., None, None]
    return taps.transpose(0, 1, 2, 4, 3, 5).reshape(3, 3, 4 * cin, 4 * cout)


def conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def make_weights(rng):
    shapes = [(3, 3, 3, 16), (3, 3, 16, 16), (3, 3, 16, 16),
              (3, 3, 16, 32), (3, 3, 32, 32), (3, 3, 32, 32)]
    return [jnp.asarray(rng.randn(*s) * 0.1, DTYPE) for s in shapes]


def plain_l12(x, ws):
    w0, w1, w2, w3, w4, w5 = ws
    x = lrelu(conv(x, w0, 2))
    x = lrelu(conv(x, w1))
    f1 = lrelu(conv(x, w2))
    x = lrelu(conv(f1, w3, 2))
    x = lrelu(conv(x, w4))
    f2 = lrelu(conv(x, w5))
    return f1, f2


def packed_l12(x, ws):
    w0, w1, w2, w3, w4, w5 = ws
    xp = space_to_depth(x)
    pad = ((0, 1), (0, 1))
    x = lrelu(conv(xp, pack_conv_kernel_s2(w0), 2, pad))
    x = lrelu(conv(x, pack_conv_kernel(w1)))
    f1 = lrelu(conv(x, pack_conv_kernel(w2)))
    x = lrelu(conv(f1, pack_conv_kernel_s2(w3), 2, pad))
    x = lrelu(conv(x, pack_conv_kernel(w4)))
    f2 = lrelu(conv(x, pack_conv_kernel(w5)))
    return f1, depth_to_space(f2)  # f1 stays packed (never read unpacked)


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    ws = make_weights(rng)

    # correctness first (f32 exactness of the lift)
    ws32 = [w.astype(jnp.float32) for w in ws]
    x32 = jnp.asarray(rng.randn(2, 32, 64, 3), jnp.float32)
    f1p, f2p = plain_l12(x32, ws32)
    f1q, f2q = packed_l12(x32, ws32)
    err1 = float(jnp.max(jnp.abs(space_to_depth(f1p) - f1q)))
    err2 = float(jnp.max(jnp.abs(f2p - f2q)))
    print(f"lift exactness: f1 {err1:.2e}  f2 {err2:.2e}")
    # TPU f32 convs round operands to bf16 by default (CLAUDE.md); the
    # lift is bit-exact on CPU, so allow bf16 accumulation noise here.
    assert err1 < 1e-3 and err2 < 1e-3

    for batch, h, w in ((32, 128, 512), (8, 128, 512), (8, 256, 1024)):
        x = jnp.asarray(rng.randn(batch, h, w, 3), DTYPE)

        def loss_of(f):
            def g(x_, *ws_):
                f1, f2 = f(x_, ws_)
                return (jnp.sum(f1.astype(jnp.float32) ** 2)
                        + jnp.sum(f2.astype(jnp.float32) ** 2))
            return g

        row = [f"[{batch},{h},{w}]"]
        for name, fn in (("plain", plain_l12), ("packed", packed_l12)):
            t_f = timeit(lambda x_, f=fn: f(x_, ws)[1], x, iters=100)
            t_g = timeit(jax.grad(loss_of(fn), argnums=tuple(range(7))),
                         x, *ws, iters=40)
            row.append(f"{name} fwd {t_f*1e3:7.3f} f+b {t_g*1e3:7.3f} ms")
        print("   ".join(row))


if __name__ == "__main__":
    main()
