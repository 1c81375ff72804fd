"""Probe: MXU one-hot matmul warp (no gather at all).

Column selection: A'[r, p] = sum_q img[r, q] * M_u[q, p]  (MXU matmul,
one-hot-with-weights M_u built in VMEM). Row selection: out[p] =
sum_r M_v[r, p] * A'[r, p] (VPU mask reduce over H). Exact bilinear
semantics, zero dynamic-gather ops.

Run: python benchmarks/probe_matmul_warp.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.kernel_bench import timeit


def p8_matmul_rate():
    """Chained [128,512]x[512,1024] f32 matmuls in one kernel."""
    iters = 16

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        acc = jnp.zeros((128, 1024), jnp.float32)
        for _ in range(iters):
            acc = jax.lax.dot_general(
                a + acc[:, :512] * 1e-38, b_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(128, 512).astype(np.float32))
    b = jnp.asarray(rng.rand(512, 1024).astype(np.float32))
    call = jax.jit(lambda x, y: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((128, 1024), jnp.float32))
        (x, y))
    try:
        dt = timeit(call, a, b, iters=20)
        per = dt / iters
        macs = 128 * 512 * 1024
        print(f"P8 matmul f32 [128,512]x[512,1024]: {per*1e6:.2f}us/matmul "
              f"({macs*2/per/1e12:.1f} TFLOP/s)", flush=True)
    except Exception as e:
        print(f"P8 FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


def p9_matmul_warp():
    """Full fwd warp for 32 frames 128x512x3 via matmul-warp."""
    H, W, C, TILE = 128, 512, 3, 8
    BN = 32
    SUB = 2                # rows per inner sub-tile
    NPIX = SUB * W         # 1024 (M_u stays [W, 1024] = 2 MB)

    def kernel(img_ref, u_ref, v_ref, o_ref):
        for s in range(TILE // SUB):
            u = u_ref[0, 0, s * SUB:(s + 1) * SUB].reshape(1, NPIX)
            v = v_ref[0, 0, s * SUB:(s + 1) * SUB].reshape(1, NPIX)
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
                ap = jax.lax.dot_general(
                    img_ref[0, c], m_u, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [H, NPIX]
                o_ref[0, c, s * SUB:(s + 1) * SUB] = \
                    jnp.sum(m_v * ap, axis=0).reshape(SUB, W)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BN, C, H, W).astype(np.float32))
    ntiles = H // TILE
    u = jnp.asarray(
        rng.uniform(-1, W, (BN, ntiles, TILE, W)).astype(np.float32))
    v = jnp.asarray(
        rng.uniform(-1, H, (BN, ntiles, TILE, W)).astype(np.float32))

    def call(img, u, v):
        return pl.pallas_call(
            kernel,
            grid=(BN, ntiles),
            in_specs=[
                pl.BlockSpec((1, C, H, W), lambda b, t: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, TILE, W), lambda b, t: (b, t, 0, 0)),
                pl.BlockSpec((1, 1, TILE, W), lambda b, t: (b, t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, C, TILE, W),
                                   lambda b, t: (b, 0, t, 0)),
            out_shape=jax.ShapeDtypeStruct((BN, C, H, W), jnp.float32),
        )(img, u, v)

    try:
        jitted = jax.jit(call)
        out = np.asarray(jitted(img, u, v))
        uu = np.asarray(u)[0].reshape(H, W)
        vv = np.asarray(v)[0].reshape(H, W)
        uf0 = np.floor(uu)
        uc = np.clip(uf0 + 1, 0, W - 1)
        uf = np.clip(uf0, 0, W - 1)
        vf0 = np.floor(vv)
        vc = np.clip(vf0 + 1, 0, H - 1)
        vf = np.clip(vf0, 0, H - 1)
        valid = ((uf + 1 == uc) & (vf + 1 == vc)).astype(np.float32)
        wu, wv = uc - uu, vc - vv
        ok = True
        for c in range(C):
            im = np.asarray(img)[0, c]
            ref = valid * (
                wv * (wu * im[vf.astype(int), uf.astype(int)]
                      + (1 - wu) * im[vf.astype(int), uc.astype(int)])
                + (1 - wv) * (wu * im[vc.astype(int), uf.astype(int)]
                              + (1 - wu) * im[vc.astype(int),
                                              uc.astype(int)]))
            ok = ok and np.allclose(out[0, c], ref, atol=1e-4)
        dt = timeit(jitted, img, u, v, iters=10)
        print(f"P9 matmul-warp fwd: ok={ok} {dt*1e3:.2f}ms for {BN} frames "
              f"128x512x3 (XLA patch gather: ~29ms)", flush=True)
    except Exception as e:
        print(f"P9 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    p9_matmul_warp()
    p8_matmul_rate()
