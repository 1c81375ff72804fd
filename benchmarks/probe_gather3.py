"""Round-3 probes: gather table-width envelope + in-kernel throughput.

Run: python benchmarks/probe_gather3.py
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.kernel_bench import timeit


def _gather_probe(name, shape, axis):
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*shape).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, shape[axis], shape), jnp.int32)
    try:
        call = jax.jit(lambda a, b: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(a, b))
        out = call(x, idx)
        ok = np.allclose(np.asarray(out),
                         np.take_along_axis(np.asarray(x), np.asarray(idx),
                                            axis=axis))
        print(f"{name}: ok={ok}", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def chained_gather_throughput(sublanes=128, iters=64):
    """iters dependent [S,128] lane gathers inside ONE kernel."""
    S = sublanes

    def kernel(x_ref, idx_ref, o_ref):
        acc = x_ref[:]
        idx = idx_ref[:]
        for _ in range(iters):
            acc = jnp.take_along_axis(x_ref[:] + acc * 1e-38, idx, axis=1)
        o_ref[:] = acc

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(S, 128).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 128, (S, 128)), jnp.int32)
    try:
        call = jax.jit(lambda a, b: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32))
            (a, b))
        dt = timeit(call, x, idx, iters=20)
        per = dt / iters
        print(f"chained gather [{S},128] x{iters}: {per*1e9:.0f} ns/gather "
              f"({S*128/per/1e9:.2f} Gelem/s)", flush=True)
    except Exception as e:
        print(f"chained gather [{S},128] FAILED: {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    _gather_probe("E1 lane [128,256]", (128, 256), 1)
    _gather_probe("E2 sublane [128,128]", (128, 128), 0)
    _gather_probe("E3 sublane [256,128]", (256, 128), 0)
    chained_gather_throughput(128, 64)
    chained_gather_throughput(512, 16)
