"""Probe: is training-mode BatchNorm at the HBM bandwidth floor?

normalization.py accounts for ~29 ms of the 160 ms high-res step
(docs/DESIGN.md step breakdown). Training BN is bandwidth-bound:
fwd = stats pass (read X) + normalize pass (read X, write Y);
bwd = two reduction passes + dgrad pass. Floor at v5e ~810 GB/s:
    fwd: 3 * nbytes, bwd: ~5 * nbytes  (bf16 activations)

Candidates measured (fwd and fwd+grad, value+grad wrt x and scale):
  flax    : nn.BatchNorm(use_running_average=False) as the model uses it
  manual  : jnp two-pass (mean/var via jnp.mean of x and x*x) + affine
  onepass : E[x], E[x^2] in ONE fused reduction pair (single read), then
            normalize -- tests whether XLA already merges flax's passes

    python benchmarks/probe_bn.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.kernel_bench import timeit


def make_flax(shape):
    bn = nn.BatchNorm(use_running_average=False, momentum=0.99,
                      epsilon=1e-3, dtype=jnp.bfloat16,
                      param_dtype=jnp.float32)
    x0 = jnp.zeros(shape, jnp.bfloat16)
    variables = bn.init(jax.random.PRNGKey(0), x0)

    def fwd(x, params):
        y, _ = bn.apply({"params": params,
                         "batch_stats": variables["batch_stats"]}, x,
                        mutable=["batch_stats"])
        return y
    return fwd, variables["params"]


def manual_bn(x, params):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean((xf - mean) ** 2, axis=(0, 1, 2))
    inv = jax.lax.rsqrt(var + 1e-3) * params["scale"]
    return ((xf - mean) * inv + params["bias"]).astype(x.dtype)


def onepass_bn(x, params):
    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=(0, 1, 2))
    s2 = jnp.mean(xf * xf, axis=(0, 1, 2))
    var = s2 - s1 * s1
    inv = jax.lax.rsqrt(var + 1e-3) * params["scale"]
    return ((xf - s1) * inv + params["bias"]).astype(x.dtype)


def grad_wrap(fn):
    def f(x, params):
        def loss(x_, p_):
            return jnp.sum(fn(x_, p_).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1))(x, params)
    return f


# representative high-res b4 activation shapes (EfficientNetB5 stages)
SHAPES = [
    (4, 128, 512, 48),
    (4, 128, 512, 144),
    (4, 64, 256, 240),
    (4, 32, 128, 384),
    (4, 16, 64, 768),
]

BW_GBPS = 810.0  # v5e HBM


def main():
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}")
    for shape in SHAPES:
        x = jnp.asarray(rng.rand(*shape).astype(np.float32) * 2 - 1,
                        jnp.bfloat16)
        fwd_flax, params = make_flax(shape)
        pp = {"scale": params["scale"], "bias": params["bias"]}
        nbytes = x.size * 2
        floor_f = 3 * nbytes / (BW_GBPS * 1e9)
        floor_g = 5 * nbytes / (BW_GBPS * 1e9)
        # numeric check
        ref = np.asarray(fwd_flax(x, params), np.float32)
        got = np.asarray(manual_bn(x, pp), np.float32)
        err = float(np.max(np.abs(ref - got)))
        tf_ = timeit(fwd_flax, x, params)
        tm = timeit(manual_bn, x, pp)
        to = timeit(onepass_bn, x, pp)
        gf = timeit(grad_wrap(fwd_flax), x, params)
        gm = timeit(grad_wrap(manual_bn), x, pp)
        go = timeit(grad_wrap(onepass_bn), x, pp)
        print(f"{str(shape):22s} fwd flax {tf_*1e3:6.3f} man {tm*1e3:6.3f} "
              f"one {to*1e3:6.3f} (floor {floor_f*1e3:5.3f}) | "
              f"grad flax {gf*1e3:6.3f} man {gm*1e3:6.3f} one {go*1e3:6.3f} "
              f"(floor {floor_g*1e3:5.3f})  err {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
