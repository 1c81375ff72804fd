"""Probe v2: reshape-free matmul-warp kernel (suspect: in-kernel
lane<->sublane reshape crashed the backend compiler in v1).

Coords arrive as [BN, ntiles, 1, NPIX]; outputs leave as
[BN, C, ntiles, 1, NPIX] (5D blocks whose last-2 dims are (1, NPIX) ==
array dims). XLA reshapes to [BN, C, H, W] outside — contiguity makes
it free.

Run: python benchmarks/probe_matmul_warp2.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from benchmarks.kernel_bench import timeit

H, W, C = 128, 512, 3
BN = 32
NPIX = 1024
NT = H * W // NPIX  # 64 tiles


def kernel(img_ref, u_ref, v_ref, o_ref):
    u = u_ref[0, 0]   # [1, NPIX]
    v = v_ref[0, 0]
    uf0 = jnp.floor(u)
    uc = jnp.clip(uf0 + 1.0, 0.0, W - 1)
    uf = jnp.clip(uf0, 0.0, W - 1)
    vf0 = jnp.floor(v)
    vc = jnp.clip(vf0 + 1.0, 0.0, H - 1)
    vf = jnp.clip(vf0, 0.0, H - 1)
    valid = (uf + 1.0 == uc) & (vf + 1.0 == vc)
    w_u = uc - u
    w_v = vc - v
    ufi = uf.astype(jnp.int32)
    vfi = vf.astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, NPIX), 0)
    m_u = (jnp.where(cols == ufi, w_u, 0.0)
           + jnp.where(cols == ufi + 1, 1.0 - w_u, 0.0))
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, NPIX), 0)
    m_v = (jnp.where(rows == vfi, w_v, 0.0)
           + jnp.where(rows == vfi + 1, 1.0 - w_v, 0.0))
    m_v = jnp.where(valid, m_v, 0.0)
    for c in range(C):
        a = jax.lax.dot_general(
            img_ref[0, c], m_u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [H, NPIX]
        o_ref[0, c, 0] = jnp.sum(m_v * a, axis=0)[None]


def call(img, u, v):
    out = pl.pallas_call(
        kernel,
        grid=(BN, NT),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, NPIX), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, NPIX), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, 1, 1, NPIX),
                               lambda b, t: (b, 0, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BN, C, NT, 1, NPIX), jnp.float32),
    )(img, u, v)
    return out.reshape(BN, C, H, W)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BN, C, H, W).astype(np.float32))
    u = jnp.asarray(rng.uniform(-1, W, (BN, NT, 1, NPIX))
                    .astype(np.float32))
    v = jnp.asarray(rng.uniform(-1, H, (BN, NT, 1, NPIX))
                    .astype(np.float32))
    try:
        jitted = jax.jit(call)
        out = np.asarray(jitted(img, u, v))
        uu = np.asarray(u)[0].reshape(H, W)
        vv = np.asarray(v)[0].reshape(H, W)
        im = np.asarray(img)[0, 0]
        uf0 = np.floor(uu)
        ucn = np.clip(uf0 + 1, 0, W - 1)
        ufn = np.clip(uf0, 0, W - 1)
        vf0 = np.floor(vv)
        vcn = np.clip(vf0 + 1, 0, H - 1)
        vfn = np.clip(vf0, 0, H - 1)
        ok_mask = ((ufn + 1 == ucn) & (vfn + 1 == vcn)).astype(np.float32)
        wu, wv = ucn - uu, vcn - vv
        ref = ok_mask * (
            wv * (wu * im[vfn.astype(int), ufn.astype(int)]
                  + (1 - wu) * im[vfn.astype(int), ucn.astype(int)])
            + (1 - wv) * (wu * im[vcn.astype(int), ufn.astype(int)]
                          + (1 - wu) * im[vcn.astype(int),
                                          ucn.astype(int)]))
        ok = np.allclose(out[0, 0], ref, atol=1e-4)
        dt = timeit(jitted, img, u, v, iters=10)
        print(f"P9v2 matmul-warp fwd: ok={ok} {dt*1e3:.2f}ms for {BN} "
              f"frames 128x512x3 (XLA patch gather: ~29ms)", flush=True)
    except Exception as e:
        print(f"P9v2 FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)


if __name__ == "__main__":
    main()
