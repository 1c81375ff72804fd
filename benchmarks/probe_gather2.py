"""Round-2 probes: Mosaic dynamic_gather legal forms + warp-row kernel.

Mosaic's gather lowering (jax/_src/pallas/mosaic/lowering.py:2464) requires
operand/indices/output to share one 2D shape and supports axis=0 (sublane)
and axis=1 (lane) gathers. These probes establish which table widths the
hardware accepts and what a correct warp kernel built on them costs.

Run: python benchmarks/probe_gather2.py
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


def _gather_probe(name, shape, axis):
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*shape).astype(np.float32))
    hi = shape[axis]
    idx = jnp.asarray(rng.randint(0, hi, shape), jnp.int32)
    try:
        call = jax.jit(lambda a, b: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(a, b))
        out = call(x, idx)
        ok = np.allclose(np.asarray(out),
                         np.take_along_axis(np.asarray(x), np.asarray(idx),
                                            axis=axis))
        dt = timeit(call, x, idx, iters=50)
        n = shape[0] * shape[1]
        print(f"{name}: ok={ok} {dt*1e6:.1f}us ({n/dt/1e9:.2f} Gelem/s)",
              flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def p7_warp_rows():
    """Correct warp via per-output-row lane gather [H, W] + row-mask reduce.

    Requires table width W (=512) lane gather. Grid: (frames, row tiles);
    whole [3, H, W] channel-first frame resident per frame.
    """
    H, W, TILE = 128, 512, 8
    BN = 32

    def kernel(img_ref, u_ref, v_ref, o_ref):
        for j in range(TILE):
            u = u_ref[0, 0, j]            # [W] f32
            v = v_ref[0, 0, j]            # [W] f32
            uf = jnp.floor(u)
            uc = jnp.clip(uf + 1.0, 0.0, W - 1)
            ufc = jnp.clip(uf, 0.0, W - 1)
            vf = jnp.floor(v)
            vc = jnp.clip(vf + 1.0, 0.0, H - 1)
            vfc = jnp.clip(vf, 0.0, H - 1)
            valid = ((ufc + 1.0 == uc) & (vfc + 1.0 == vc))
            w_u = (uc - u)[None]          # [1, W]
            w_v = (vc - v)[None]
            rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            vfi = vfc.astype(jnp.int32)[None]
            m = (jnp.where(rows == vfi, w_v, 0.0)
                 + jnp.where(rows == vfi + 1, 1.0 - w_v, 0.0))
            m = jnp.where(valid[None], m, 0.0)
            idx_f = jnp.broadcast_to(ufc.astype(jnp.int32)[None], (H, W))
            idx_c = jnp.broadcast_to(uc.astype(jnp.int32)[None], (H, W))
            for c in range(3):
                img = img_ref[0, c]
                g_f = jnp.take_along_axis(img, idx_f, axis=1)
                g_c = jnp.take_along_axis(img, idx_c, axis=1)
                col = w_u * g_f + (1.0 - w_u) * g_c
                o_ref[0, c, j] = jnp.sum(m * col, axis=0)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BN, 3, H, W).astype(np.float32))
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
                pl.BlockSpec((1, 3, H, W), lambda b, t: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, TILE, W), lambda b, t: (b, t, 0, 0)),
                pl.BlockSpec((1, 1, TILE, W), lambda b, t: (b, t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 3, TILE, W),
                                   lambda b, t: (b, 0, t, 0)),
            out_shape=jax.ShapeDtypeStruct((BN, 3, H, W), jnp.float32),
        )(img, u, v)

    try:
        jitted = jax.jit(call)
        out = np.asarray(jitted(img, u, v))
        # numpy reference (frame 0, channel 0)
        uu = np.asarray(u)[0].reshape(H, W)
        vv = np.asarray(v)[0].reshape(H, W)
        im = np.asarray(img)[0, 0]
        uf0 = np.floor(uu)
        uc = np.clip(uf0 + 1, 0, W - 1)
        uf = np.clip(uf0, 0, W - 1)
        vf0 = np.floor(vv)
        vc = np.clip(vf0 + 1, 0, H - 1)
        vf = np.clip(vf0, 0, H - 1)
        valid = ((uf + 1 == uc) & (vf + 1 == vc)).astype(np.float32)
        wu, wv = uc - uu, vc - vv
        ref = valid * (
            wv * (wu * im[vf.astype(int), uf.astype(int)]
                  + (1 - wu) * im[vf.astype(int), uc.astype(int)])
            + (1 - wv) * (wu * im[vc.astype(int), uf.astype(int)]
                          + (1 - wu) * im[vc.astype(int), uc.astype(int)]))
        ok = np.allclose(out[0, 0], ref, atol=1e-5)
        dt = timeit(jitted, img, u, v, iters=10)
        print(f"P7 warp-row kernel: ok={ok} {dt*1e3:.2f}ms for "
              f"{BN} frames 128x512 (XLA patch gather: ~32ms)", flush=True)
    except Exception as e:
        print(f"P7 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    _gather_probe("P5a lane-gather [128,512]", (128, 512), 1)
    _gather_probe("P5b lane-gather [256,1024]", (256, 1024), 1)
    _gather_probe("P6  sublane-gather [128,512]", (128, 512), 0)
    p7_warp_rows()
