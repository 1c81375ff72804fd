"""Decision matrix for the depthwise-conv formulation swap.

probe_dw_stencil.py showed lax's grouped depthwise is strongly
shape-dependent (0.08 ms near-floor at C>=144 vs 0.76 ms at C=48 on the
same element count) while a k^2 shifted-FMA is flat. This sweeps the
actual EfficientNetB5 depthwise shapes (low-res b8 and high-res b4),
fwd and fwd+grad, to pick the integration rule.

FMA accumulates in f32 (reads stay bf16) so it matches the conv's f32
accumulator numerics.

    python benchmarks/probe_dw_matrix.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.kernel_bench import timeit


def dw_lax(x, k, stride=1):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dw_fma(x, k, stride=1):
    """k^2 shifted FMAs, f32 accumulation, SAME padding, stride 1/2."""
    kh = k.shape[0]
    # lax SAME pad for stride s on even sizes: total k-s, lo = (k-s)//2
    pad = max(kh - stride, 0) // 2
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, kh - 1 - pad), (pad, kh - 1 - pad),
                     (0, 0)))
    kf = k.astype(jnp.float32)
    acc = None
    for u in range(kh):
        for v in range(kh):
            t = jax.lax.slice(
                xp, (0, u, v, 0),
                (b, u + h, v + w, c)).astype(jnp.float32) * kf[u, v, 0]
            acc = t if acc is None else acc + t
    if stride == 2:
        acc = acc[:, ::2, :, :][:, :, ::2, :]
    return acc.astype(x.dtype)


def grad_wrap(fn):
    def f(x, k):
        def loss(x_, k_):
            return jnp.sum(fn(x_, k_).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1))(x, k)
    return f


# EfficientNetB5 depthwise sites (C, kernel, stride, H, W at LOW-res b8);
# high-res b4 doubles H and W and halves batch.
B5_SITES = [
    ("stage0r0", 48, 3, 1, 64, 256),
    ("stage0r1+", 24, 3, 1, 64, 256),
    ("stage1r0", 144, 3, 2, 64, 256),
    ("stage1r1+", 240, 3, 1, 32, 128),
    ("stage2r0", 240, 5, 2, 32, 128),
    ("stage2r1+", 384, 5, 1, 16, 64),
    ("stage3r0", 384, 3, 2, 16, 64),
    ("stage3r1+", 768, 3, 1, 8, 32),
]


def main():
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}")
    for res, bmul, hwmul in [("low_b8", 8, 1), ("high_b4", 4, 2)]:
        for name, c, kh, stride, h0, w0 in B5_SITES:
            h, w = h0 * hwmul, w0 * hwmul
            x = jnp.asarray(rng.rand(bmul, h, w, c).astype(np.float32)
                            * 2 - 1, jnp.bfloat16)
            k = jnp.asarray(rng.rand(kh, kh, 1, c).astype(np.float32) * 0.1,
                            jnp.bfloat16)
            ref = dw_lax(x.astype(jnp.float32), k.astype(jnp.float32), stride)
            got = dw_fma(x.astype(jnp.float32), k.astype(jnp.float32), stride)
            err = float(jnp.max(jnp.abs(got - ref)))
            import functools
            lax_s = functools.partial(dw_lax, stride=stride)
            fma_s = functools.partial(dw_fma, stride=stride)
            tl = timeit(lax_s, x, k)
            tf = timeit(fma_s, x, k)
            gl = timeit(grad_wrap(lax_s), x, k)
            gf = timeit(grad_wrap(fma_s), x, k)
            win = "FMA" if (tf + gf) < (tl + gl) else "lax"
            print(f"{res} {name:10s} C={c:4d} k{kh} s{stride} [{bmul}x{h}x{w}]"
                  f"  fwd lax {tl*1e3:7.3f} fma {tf*1e3:7.3f}"
                  f"  grad lax {gl*1e3:7.3f} fma {gf*1e3:7.3f}"
                  f"  -> {win}  (err {err:.1e})", flush=True)


if __name__ == "__main__":
    main()
