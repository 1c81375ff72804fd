"""Probe: do int8 convolutions reach the MXU's 2x int8 rate through XLA?

Decides whether a post-training-quantized serving path (int8 EffB5
backbone) is worth building. Representative shapes from the EffB5
128x512 forward: an early wide-spatial conv, a mid 1x1 expand, and the
stride-2 stem. Compares s8xs8->s32 lax.conv against the bf16 conv we
ship today. Run on the TPU:

    python benchmarks/probe_int8_conv.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from kernel_bench import timeit


def conv(x, w, stride=1, dtype=None):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)


SHAPES = [
    # (name, x_shape, w_shape, stride)
    ("stem3x3_s2", (8, 128, 512, 3), (3, 3, 3, 48), 2),
    ("mid3x3", (8, 32, 128, 96), (3, 3, 96, 96), 1),
    ("expand1x1", (8, 16, 64, 136), (1, 1, 136, 816), 1),
    ("head1x1", (8, 4, 16, 512), (1, 1, 512, 2048), 1),
]


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    for name, xs, ws, stride in SHAPES:
        x = rng.uniform(-1, 1, xs).astype(np.float32)
        w = rng.uniform(-0.2, 0.2, ws).astype(np.float32)
        x_bf, w_bf = jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16)
        x_i8 = jnp.asarray(np.clip(x * 127, -127, 127), jnp.int8)
        w_i8 = jnp.asarray(np.clip(w * 635, -127, 127), jnp.int8)

        # sub-100us kernels: need 300+ chained iterations on the tunnel
        # (CLAUDE.md timing note) or the slope is pure noise
        t_bf = timeit(lambda a, b: conv(a, b, stride), x_bf, w_bf,
                      iters=300)
        try:
            t_i8 = timeit(lambda a, b: conv(a, b, stride, jnp.int32),
                          x_i8, w_i8, iters=300)
        except Exception as e:  # unsupported lowering
            print(f"{name:12s} bf16 {t_bf*1e3:7.3f} ms   int8 FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}")
            continue
        flops = (2 * np.prod(xs[:3]) / stride**2 * np.prod(ws))
        print(f"{name:12s} bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:5.1f} TF/s)"
              f"   int8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:5.1f} TOP/s)"
              f"   speedup {t_bf/t_i8:4.2f}x")


if __name__ == "__main__":
    main()
