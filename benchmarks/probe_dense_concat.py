"""Probe: DenseNet-style concat+conv chain vs split-weight accumulation.

PWC-Net's FlowPredictor concatenates every layer's output onto its input
(flow_net.py predictor, reference flow_net.py:127-147); the joint-stage
trace shows 2.25 ms/step of concatenate ops + part of 3.6 ms data
formatting from these chains. conv(concat(a, b), W) ==
conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:]) exactly, so the chain can
run without materializing any concat -- same FLOPs, same params, more
smaller matmuls. Measures both at the level-2/3 predictor shapes
(fwd and fwd+bwd). Run on the TPU:

    python benchmarks/probe_dense_concat.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from kernel_bench import timeit

CHAIN = (128, 128, 96, 64)
SHAPES = [  # (name, B, H, W, Cin) of the predictor input x
    ("L2", 32, 32, 128, 117),   # corr81 + cl32 + flow2 + feat2
    ("L3", 32, 16, 64, 149),    # corr81 + cl64 + 4
]


def conv(x, w):
    return jax.nn.leaky_relu(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")), 0.1)


def make_weights(cin, rng):
    ws, c = [], cin
    for ch in CHAIN:
        ws.append(jnp.asarray(rng.randn(3, 3, c, ch) * 0.05, jnp.bfloat16))
        c += ch
    return ws


def dense_concat(x, ws):
    for w in ws:
        c = conv(x, w)
        x = jnp.concatenate([x, c], axis=-1)
    return x


def dense_split(x, ws):
    feats = [x]
    for w in ws:
        splits, start = [], 0
        for f in feats:
            cin = f.shape[-1]
            splits.append((f, jax.lax.slice_in_dim(w, start, start + cin,
                                                   axis=2)))
            start += cin
        pre = sum(jax.lax.conv_general_dilated(
            f, wp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            for f, wp in splits)
        feats.append(jax.nn.leaky_relu(pre, 0.1))
    return jnp.concatenate(feats, axis=-1)


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    for name, b, h, w, cin in SHAPES:
        x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
        ws = make_weights(cin, rng)

        def g(fn):
            def grad_fn(x_, *ws_):
                return jax.grad(lambda a, *wl: jnp.sum(
                    fn(a, list(wl)).astype(jnp.float32)),
                    argnums=tuple(range(len(ws_) + 1)))(x_, *ws_)
            return grad_fn

        t_cat = timeit(lambda a: dense_concat(a, ws), x)
        t_spl = timeit(lambda a: dense_split(a, ws), x)
        tg_cat = timeit(g(dense_concat), x, *ws)
        tg_spl = timeit(g(dense_split), x, *ws)
        print(f"{name} [{b},{h},{w},{cin}]  concat fwd {t_cat*1e3:7.3f} "
              f"bwd {tg_cat*1e3:7.3f}   split fwd {t_spl*1e3:7.3f} "
              f"bwd {tg_spl*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
