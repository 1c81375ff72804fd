"""Decision probe: dense 3x3 convs as k^2 shifted MXU matmuls.

The high-res step trace shows 24 ms of nn.Conv (flax linear.py) and
45 ms of XLA-internal copies, dominated by conv-backward layout
relayouts (batch/spatial-minor shuffles around wgrad/dgrad). The
depthwise probe (probe_dw_matrix.py) showed expanding a conv into
shifted per-tap contractions removes conv-backward entirely and wins
3x at relayout-dominated shapes. This sweeps the flagship decoder /
backbone DENSE conv shapes: lax conv vs sum_{u,v} shift(x) @ W[u,v]
(dot_general on the MXU, f32 accumulation -- same products as the
conv).

    python benchmarks/probe_conv_matrix.py
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.kernel_bench import timeit


def conv_lax(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_mm(x, w):
    """k^2 shifted matmuls; f32 accumulation across taps."""
    kh, kw, cin, cout = w.shape
    b, h, wd, _ = x.shape
    pad = kh // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = None
    for u in range(kh):
        for v in range(kw):
            t = jax.lax.slice(xp, (0, u, v, 0), (b, u + h, v + wd, cin))
            p = jax.lax.dot_general(
                t.reshape(-1, cin), w[u, v],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
    return acc.reshape(b, h, wd, cout).astype(x.dtype)


def grad_wrap(fn):
    def f(x, w):
        def loss(x_, w_):
            return jnp.sum(fn(x_, w_).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1))(x, w)
    return f


# (tag, B, H, W, Cin, Cout): flagship high-res b4 decoder levels
# (unpacked coarse + packed-domain fine), low-res b8 equivalents
SITES = [
    ("hr_dec16", 4, 16, 64, 512, 256),
    ("hr_dec32", 4, 32, 128, 512, 256),
    ("hr_dec64", 4, 64, 256, 256, 128),
    ("hr_dec128", 4, 128, 512, 128, 64),
    ("hr_packed256", 4, 128, 512, 128, 128),
    ("lr_dec16", 8, 16, 64, 256, 128),
    ("lr_dec32", 8, 32, 128, 128, 64),
    ("lr_packed64", 8, 32, 128, 128, 128),
]


def main():
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}")
    for tag, b, h, w, cin, cout in SITES:
        x = jnp.asarray(rng.rand(b, h, w, cin).astype(np.float32) * 2 - 1,
                        jnp.bfloat16)
        k = jnp.asarray(rng.rand(3, 3, cin, cout).astype(np.float32) * 0.05,
                        jnp.bfloat16)
        ref = conv_lax(x.astype(jnp.float32), k.astype(jnp.float32))
        got = conv_mm(x.astype(jnp.float32), k.astype(jnp.float32))
        err = float(jnp.max(jnp.abs(got - ref)))
        tl = timeit(conv_lax, x, k)
        tm = timeit(conv_mm, x, k)
        gl = timeit(grad_wrap(conv_lax), x, k)
        gm = timeit(grad_wrap(conv_mm), x, k)
        win = "MM" if (tm + gm) < (tl + gl) else "lax"
        print(f"{tag:13s} [{b}x{h}x{w}x{cin}->{cout}]"
              f"  fwd lax {tl*1e3:7.3f} mm {tm*1e3:7.3f}"
              f"  grad lax {gl*1e3:7.3f} mm {gm*1e3:7.3f}"
              f"  -> {win}  (err {err:.1e})", flush=True)


if __name__ == "__main__":
    main()
