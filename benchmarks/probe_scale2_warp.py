"""Probe: is the Pallas const-src warp profitable at the coarse scales?

The r2 step trace showed the scale-2 (32x128) loss/coords fusions costing
~2.3 ms -- more than their scale-0 counterparts -- with sampling on the
XLA one-hot path (ops/warp.py routes hw <= ONEHOT_MAX_PIXELS there).
This times the bare warp at scales 2 (32x128) and 1 (64x256) through

  - the XLA one-hot MXU formulation (current routing for scale 2),
  - the Pallas int8 kernel (current routing for scales 0-1),

fwd and fwd+grad-through-coords, b8 n4 c3.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.kernel_bench import timeit
from xpt_mde_tpu.ops import warp as warp_mod
from xpt_mde_tpu.ops.pallas import warp as pallas_warp

B, N, C = 8, 4, 3


def make_args(h, w, seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(
        (rng.randint(0, 256, (B, N, h, w, C)) / 127.5 - 1).astype(np.float32))
    u = rng.rand(B, N, h * w).astype(np.float32) * (w + 6) - 3
    v = rng.rand(B, N, h * w).astype(np.float32) * (h + 6) - 3
    coords = jnp.asarray(np.stack([u, v], axis=2))
    mask = jnp.asarray((rng.rand(B, h, w, 1) > 0.05).astype(np.float32))
    return img, coords, mask


def xla_onehot(img, coords, mask):
    ints, weights = warp_mod._neighbor_weights(img, coords, mask)
    return warp_mod._sample_onehot(img, ints, weights)


def pallas_int8(img, coords, mask):
    return pallas_warp.bilinear_sample_const_src(img, coords, mask,
                                                 mode="int8")


def grad_wrap(fn):
    def loss(img, coords, mask):
        return jnp.sum(jnp.abs(fn(img, coords, mask)))
    return jax.grad(loss, argnums=1)


def main():
    for h, w in [(32, 128), (64, 256)]:
        img, coords, mask = make_args(h, w)
        sup = pallas_warp.supported(img.shape, mode="int8")
        # the one-hot grad materializes [B,N,HW,HW] -- 32 GB at 64x256;
        # only probe XLA where production would actually route there
        small = h * w <= warp_mod.ONEHOT_MAX_PIXELS
        print(f"--- {h}x{w}  pallas_supported={sup}")
        t = timeit(xla_onehot, img, coords, mask)
        print(f"xla_onehot fwd        {t*1e6:9.1f} us")
        if sup:
            t = timeit(pallas_int8, img, coords, mask)
            print(f"pallas_int8 fwd       {t*1e6:9.1f} us")
        if small:
            t = timeit(grad_wrap(xla_onehot), img, coords, mask)
            print(f"xla_onehot fwd+grad   {t*1e6:9.1f} us")
        if sup:
            t = timeit(grad_wrap(pallas_int8), img, coords, mask)
            print(f"pallas_int8 fwd+grad  {t*1e6:9.1f} us")


if __name__ == "__main__":
    main()
