"""Probe: does Mosaic lower an int8 x int8 -> int32 dot on this TPU, and
at what rate vs bf16? Decides whether the warp kernel's one-hot matmuls
can ride the 2x int8 MXU path (v5e: 394 TOPS int8 vs 197 TFLOPs bf16).

    python benchmarks/probe_int8_dot.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, K, N = 128, 512, 1024


CHAIN = 8  # dots per kernel call, to drown per-call overhead


def _kernel_int8(a_ref, b_ref, o_ref):
    a = a_ref[...]
    acc = jax.lax.dot_general(a, b_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    for _ in range(CHAIN - 1):
        # feed low bits back into a: data dependency, no CSE
        a = (a + (acc[:, :K] & 1).astype(jnp.int8))
        acc = jax.lax.dot_general(a, b_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
    o_ref[...] = acc


def _kernel_bf16(a_ref, b_ref, o_ref):
    a = a_ref[...]
    acc = jax.lax.dot_general(a, b_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    for _ in range(CHAIN - 1):
        a = (a + (acc[:, :K] * 1e-38).astype(jnp.bfloat16))
        acc = jax.lax.dot_general(a, b_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    o_ref[...] = acc


def run(dtype, kernel, out_dtype):
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.randint(-128, 128, (M, K)), jnp.int8)
        b = jnp.asarray(rng.randint(-2, 2, (K, N)), jnp.int8)
    else:
        a = jnp.asarray(rng.rand(M, K), dtype)
        b = jnp.asarray(rng.rand(K, N), dtype)
    call = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((M, N), out_dtype))

    # correctness of the first dot only matters for semantics; the chain
    # is for timing. Check a single-dot call separately.
    def _single(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype)
    out = jax.jit(pl.pallas_call(
        _single, out_shape=jax.ShapeDtypeStruct((M, N), out_dtype)))(a, b)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    err = np.abs(np.asarray(out, np.float64) - ref).max()

    # rate via kernel_bench's slope timing (chained scan, host-fetch sync,
    # two lengths -- the only reliable method on the axon tunnel)
    import time

    def run(length):
        @jax.jit
        def scan_n(a, b):
            def body(carry, _):
                # data-dependent zero bump: blocks LICM hoisting
                bump = (carry * 1e-38).astype(a.dtype)
                o = call(a + bump, b)
                return jnp.sum(o.astype(jnp.float32)), None
            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
            return s
        float(scan_n(a, b))
        t0 = time.perf_counter()
        float(scan_n(a, b))
        return time.perf_counter() - t0

    iters = 300
    t_short = run(5)
    t_long = run(5 + iters)
    dt = max(t_long - t_short, 1e-9) / iters / CHAIN
    tops = 2 * M * K * N / dt / 1e12
    return err, dt * 1e6, tops


if __name__ == "__main__":
    try:
        err, us, tops = run(jnp.int8, _kernel_int8, jnp.int32)
        print(f"int8: err={err} {us:.2f}us {tops:.1f} TOP/s")
    except Exception as exc:  # noqa: BLE001
        print(f"int8 dot FAILED: {type(exc).__name__}: {str(exc)[:300]}")
    err, us, tops = run(jnp.bfloat16, _kernel_bf16, jnp.float32)
    print(f"bf16: err={err} {us:.2f}us {tops:.1f} TF/s")
