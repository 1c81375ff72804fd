"""Probe v3: dissect matmul-warp cost + find the hardware numeric bug.

Variants share the P9v2 structure; each isolates one part:
  V0 full kernel, report max|diff| vs numpy + worst coords
  V1 mask-build only (no dot): times the VPU iota/where part
  V2 dot only (constant m_u, no iota/where): times MXU+reduce
  V3 full kernel with bf16 dot operands (f32 accum)

Run: python benchmarks/probe_matmul_warp3.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from benchmarks.kernel_bench import timeit

H, W, C = 128, 512, 3
BN = 32
NPIX = 1024
NT = H * W // NPIX


def make_kernel(mode):
    def kernel(img_ref, u_ref, v_ref, o_ref):
        u = u_ref[0, 0]
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
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, NPIX), 0)
        m_v = (jnp.where(rows == vfi, w_v, 0.0)
               + jnp.where(rows == vfi + 1, 1.0 - w_v, 0.0))
        m_v = jnp.where(valid, m_v, 0.0)
        if mode == "nodot":
            acc = jnp.sum(m_v, axis=0)[None] * 0.0
            cols = jax.lax.broadcasted_iota(jnp.int32, (W, NPIX), 0)
            m_u = (jnp.where(cols == ufi, w_u, 0.0)
                   + jnp.where(cols == ufi + 1, 1.0 - w_u, 0.0))
            acc = acc + jnp.sum(m_u, axis=0)[None]
            for c in range(C):
                o_ref[0, c, 0] = acc
            return
        if mode == "constm":
            m_u = jnp.full((W, NPIX), 1.0 / W, jnp.float32) \
                + w_u * 0.0  # keep data dependency
        else:
            cols = jax.lax.broadcasted_iota(jnp.int32, (W, NPIX), 0)
            m_u = (jnp.where(cols == ufi, w_u, 0.0)
                   + jnp.where(cols == ufi + 1, 1.0 - w_u, 0.0))
        for c in range(C):
            img = img_ref[0, c]
            mu = m_u
            if mode == "bf16":
                img = img.astype(jnp.bfloat16)
                mu = m_u.astype(jnp.bfloat16)
            a = jax.lax.dot_general(
                img, mu, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, c, 0] = jnp.sum(m_v * a, axis=0)[None]
    return kernel


def build(mode):
    kernel = make_kernel(mode)

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
            out_shape=jax.ShapeDtypeStruct((BN, C, NT, 1, NPIX),
                                           jnp.float32),
        )(img, u, v)
        return out.reshape(BN, C, H, W)
    return jax.jit(call)


def np_ref(img0, uu, vv):
    uf0 = np.floor(uu)
    ucn = np.clip(uf0 + 1, 0, W - 1)
    ufn = np.clip(uf0, 0, W - 1)
    vf0 = np.floor(vv)
    vcn = np.clip(vf0 + 1, 0, H - 1)
    vfn = np.clip(vf0, 0, H - 1)
    okm = ((ufn + 1 == ucn) & (vfn + 1 == vcn)).astype(np.float32)
    wu, wv = ucn - uu, vcn - vv
    return okm * (
        wv * (wu * img0[vfn.astype(int), ufn.astype(int)]
              + (1 - wu) * img0[vfn.astype(int), ucn.astype(int)])
        + (1 - wv) * (wu * img0[vcn.astype(int), ufn.astype(int)]
                      + (1 - wu) * img0[vcn.astype(int), ucn.astype(int)]))


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BN, C, H, W).astype(np.float32))
    u = jnp.asarray(rng.uniform(-1, W, (BN, NT, 1, NPIX))
                    .astype(np.float32))
    v = jnp.asarray(rng.uniform(-1, H, (BN, NT, 1, NPIX))
                    .astype(np.float32))

    for mode in ("full", "nodot", "constm", "bf16"):
        try:
            fn = build(mode)
            out = np.asarray(fn(img, u, v))
            msg = ""
            if mode in ("full", "bf16"):
                uu = np.asarray(u)[0].reshape(H, W)
                vv = np.asarray(v)[0].reshape(H, W)
                ref = np_ref(np.asarray(img)[0, 0], uu, vv)
                diff = np.abs(out[0, 0] - ref)
                bad = diff > (1e-4 if mode == "full" else 2e-2)
                k = np.unravel_index(np.argmax(diff), diff.shape)
                msg = (f" maxdiff={diff.max():.2e} nbad={bad.sum()}"
                       f" worst@{k} u={uu[k]:.3f} v={vv[k]:.3f}"
                       f" got={out[0,0][k]:.4f} want={ref[k]:.4f}")
            dt = timeit(fn, img, u, v, iters=10)
            print(f"{mode}: {dt*1e3:.2f}ms{msg}", flush=True)
        except Exception as e:
            print(f"{mode} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
