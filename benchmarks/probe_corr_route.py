"""Probe: per-level correlation formulation (Pallas kernel vs XLA twin).

The joint-stage trace shows the COARSE PWC levels dominate correlation
cost despite tiny tensors (level 5 [32,4,16,128] = 1.24 ms, level 6
[32,2,8,196] = 0.73 ms, vs 0.34-0.56 ms for the 8x-64x larger fine
levels): the channel-first kernel's [H, W] displacement planes occupy
2x8 cells of 8x128 VPU tiles. Measures fwd and fwd+bwd for both
formulations at every PWC level shape (batch 32 = b8 x 4 sources,
128x512 input) to decide a shape route. Run on the TPU:

    python benchmarks/probe_corr_route.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from kernel_bench import timeit

from xpt_mde_tpu.ops.correlation import correlation_cost
from xpt_mde_tpu.ops.pallas.correlation import correlation_cost_pallas

# (level, B, H, W, C): low-res 128x512 at batch 8x4 sources, then
# high-res 256x1024 at its bench batch 2x4; md = 128 >> level,
# stride = md//4
LEVELS = [(6, 32, 2, 8, 196), (5, 32, 4, 16, 128), (4, 32, 8, 32, 96),
          (3, 32, 16, 64, 64), (2, 32, 32, 128, 32),
          (6, 8, 4, 16, 196), (5, 8, 8, 32, 128), (4, 8, 16, 64, 96),
          (3, 8, 32, 128, 64), (2, 8, 64, 256, 32)]


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    for level, batch, h, w, c in LEVELS:
        md = 128 // 2 ** level
        stride = max(md // 4, 1)
        cl = jnp.asarray(rng.randn(batch, h, w, c), jnp.bfloat16)
        cr = jnp.asarray(rng.randn(batch, h, w, c), jnp.bfloat16)

        def f_pallas(a, b):
            return correlation_cost_pallas(a, b, md, stride)

        def f_xla(a, b):
            return correlation_cost(a, b, md, stride)

        def grad_of(f):
            # sum(f^2): the cotangent is DATA-DEPENDENT like in real
            # training. grad(sum(f)) has a constant-ones cotangent that
            # XLA exploits (correlation is bilinear: dcl with g=1 needs
            # no forward at all), giving bogus sub-forward "bwd" times.
            def g(a, b):
                return jax.grad(lambda a_, b_: jnp.sum(
                    f(a_, b_).astype(jnp.float32) ** 2),
                    argnums=(0, 1))(a, b)
            return g

        row = [f"L{level} md={md:3d} [{batch},{h},{w},{c}]"]
        for name, fn in (("pallas", f_pallas), ("xla", f_xla)):
            # sub-ms kernels need long on-device chains (CLAUDE.md)
            t_f = timeit(fn, cl, cr, iters=200)
            t_g = timeit(grad_of(fn), cl, cr, iters=60)
            row.append(f"{name} fwd {t_f*1e3:7.3f} f+b {t_g*1e3:7.3f} ms")
        print("   ".join(row))


if __name__ == "__main__":
    main()
