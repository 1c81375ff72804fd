"""On-chip validation + timing of ops.pallas.warp (production module).

Run: python benchmarks/check_pallas_warp_tpu.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.kernel_bench import timeit
from xpt_mde_tpu.ops.pallas.warp import bilinear_sample_const_src
from xpt_mde_tpu.ops.warp import bilinear_sample


def main():
    b, n, h, w, c = 8, 4, 128, 512, 3
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(b, n, h, w, c).astype(np.float32) * 2 - 1)
    u = rng.uniform(-4, w + 4, (b, n, 1, h * w))
    v = rng.uniform(-4, h + 4, (b, n, 1, h * w))
    coords = jnp.asarray(np.concatenate([u, v], 2).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.1).astype(np.float32))

    ref_fn = jax.jit(lambda i, cc, m: bilinear_sample(i, cc, m))
    ref = np.asarray(ref_fn(image, coords, mask))

    for mode in ("exact", "bf16", "int8"):
        fn = jax.jit(lambda i, cc, m, md=mode: bilinear_sample_const_src(
            i, cc, m, mode=md))
        try:
            got = np.asarray(fn(image, coords, mask))
            diff = np.abs(got - ref)
            dt = timeit(fn, image, coords, mask, iters=10)
            print(f"fwd mode={mode}: maxdiff={diff.max():.2e} "
                  f"{dt*1e3:.2f}ms", flush=True)
        except Exception as e:
            print(f"fwd mode={mode} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # training path: value+grad through the custom VJP
    def loss_ref(cc):
        return jnp.sum(bilinear_sample(image, cc, mask) ** 2)

    try:
        gr = jax.jit(jax.grad(loss_ref))
        g_ref = np.asarray(gr(coords))
        dt_r = timeit(gr, coords, iters=10)
        for mode in ("exact", "bf16", "int8"):
            def loss_pal(cc, md=mode):
                return jnp.sum(
                    bilinear_sample_const_src(image, cc, mask,
                                              mode=md) ** 2)
            gp = jax.jit(jax.grad(loss_pal))
            gdiff = np.abs(np.asarray(gp(coords)) - g_ref)
            dt_p = timeit(gp, coords, iters=10)
            print(f"grad mode={mode}: maxdiff={gdiff.max():.2e} "
                  f"pallas={dt_p*1e3:.2f}ms xla={dt_r*1e3:.2f}ms",
                  flush=True)
    except Exception as e:
        print(f"grad FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    dt_ref = timeit(ref_fn, image, coords, mask, iters=10)
    print(f"xla fwd: {dt_ref*1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
