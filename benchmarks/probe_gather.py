"""One-off probes for the fused Pallas warp kernel design (r2).

Answers, on the real TPU:
  P1. Is Mosaic lane-dim take_along_axis supported for [128,128] operands,
      and at what throughput?
  P2. Can the index operand be wider than the 128-lane table?
  P3. Cost of the full "row-mask reduce + chunked lane gather" warp tile.
  P4. XLA patch-gather cost vs operand dtype (f32/bf16/int8) -- is the
      per-index cost per-byte or per-tile?

Run: python benchmarks/probe_gather.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    from benchmarks.kernel_bench import timeit as t
    return t(fn, *args, iters=iters)


def p1_lane_gather():
    """[128,128] lane gather inside a trivial kernel."""
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=-1)

    x = jnp.asarray(np.random.rand(128, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, 128, (128, 128)), jnp.int32)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(x, idx)
        ok = np.allclose(np.asarray(out),
                         np.take_along_axis(np.asarray(x), np.asarray(idx),
                                            axis=-1))
        dt = timeit(lambda a, b: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))
            (a, b), x, idx, iters=50)
        print(f"P1 lane-gather [128,128]: ok={ok} {dt*1e6:.1f}us "
              f"({128*128/dt/1e9:.2f} Gelem/s)")
    except Exception as e:
        print(f"P1 lane-gather FAILED: {type(e).__name__}: {str(e)[:200]}")


def p2_wide_idx():
    """idx wider than the table: operand [128,128], idx [128,512]."""
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=-1)

    x = jnp.asarray(np.random.rand(128, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, 128, (128, 512)), jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 512), jnp.float32),
        )(x, idx)
        ok = np.allclose(
            np.asarray(out),
            np.take_along_axis(np.asarray(x),
                               np.asarray(idx) % 128, axis=-1))
        print(f"P2 wide-idx gather: ok={ok}")
    except Exception as e:
        print(f"P2 wide-idx gather FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}")


def p3_warp_tile():
    """Full warp tile: for an 8-row output tile of a [128,512] image,
    gather G_f/G_c via 4x128 column chunks + 4-way select, then row-mask
    multiply-reduce. Measures the whole-image cost by gridding over all
    16 row tiles x 32 (b,n) frames, 3 channels together."""
    H, W = 128, 512
    TILE = 8  # output rows per grid step

    def kernel(img_ref, uf_ref, w_u_ref, vf_ref, w_v_ref, o_ref):
        # img_ref: [3, H, W] (channel-first, whole frame resident)
        # uf/vf:   [TILE*W] int32 flattened target coords for this tile
        # w_u/w_v: [TILE*W] f32 fractional weights (floor side)
        npix = TILE * W
        uf = uf_ref[0, 0].reshape(1, npix)
        vf = vf_ref[0, 0].reshape(1, npix)
        w_u = w_u_ref[0, 0].reshape(1, npix)
        w_v = w_v_ref[0, 0].reshape(1, npix)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, npix), 0)
        # row mask: [H, npix], 2 nonzero rows per pixel
        m = (jnp.where(rows == vf, w_v, 0.0)
             + jnp.where(rows == vf + 1, 1.0 - w_v, 0.0))
        for c in range(3):
            img = img_ref[0, c]  # [H, W]
            # chunked lane gather over columns: uf and uf+1
            acc = jnp.zeros((H, npix), jnp.float32)
            for side, w_side in ((0, w_u), (1, 1.0 - w_u)):
                u = jnp.clip(uf + side, 0, W - 1)
                g = jnp.zeros((H, npix), jnp.float32)
                for mchunk in range(W // 128):
                    tbl = img[:, mchunk * 128:(mchunk + 1) * 128]
                    lo = jnp.clip(u - mchunk * 128, 0, 127)
                    gm = jnp.take_along_axis(
                        tbl, jnp.broadcast_to(lo, (H, npix)), axis=-1)
                    g = jnp.where((u >= mchunk * 128)
                                  & (u < (mchunk + 1) * 128), gm, g)
                acc = acc + w_side * g
            o_ref[0, c] = jnp.sum(m * acc, axis=0).reshape(TILE, W)

    b_n = 32
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b_n, 3, H, W).astype(np.float32))
    # coherent-ish coords
    ntiles = H // TILE
    uf = jnp.asarray(rng.randint(0, W - 1, (b_n, ntiles, TILE, W)), jnp.int32)
    vf = jnp.asarray(rng.randint(0, H - 1, (b_n, ntiles, TILE, W)), jnp.int32)
    w_u = jnp.asarray(rng.rand(b_n, ntiles, TILE, W).astype(np.float32))
    w_v = jnp.asarray(rng.rand(b_n, ntiles, TILE, W).astype(np.float32))

    def call(img, uf, vf, w_u, w_v):
        return pl.pallas_call(
            kernel,
            grid=(b_n, ntiles),
            in_specs=[
                pl.BlockSpec((1, 3, H, W), lambda b, t: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, TILE, W), lambda b, t: (b, t, 0, 0)),
                pl.BlockSpec((1, 1, TILE, W), lambda b, t: (b, t, 0, 0)),
                pl.BlockSpec((1, 1, TILE, W), lambda b, t: (b, t, 0, 0)),
                pl.BlockSpec((1, 1, TILE, W), lambda b, t: (b, t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 3, TILE, W),
                                   lambda b, t: (b, 0, t, 0)),
            out_shape=jax.ShapeDtypeStruct((b_n, 3, H, W), jnp.float32),
        )(img, uf, w_u, vf, w_v)

    try:
        jitted = jax.jit(call)
        out = jitted(img, uf, vf, w_u, w_v)
        out.block_until_ready()
        # correctness spot check on frame 0, channel 0
        o = np.asarray(out)[0, 0].reshape(-1)
        iuf = np.asarray(uf)[0].reshape(-1)
        ivf = np.asarray(vf)[0].reshape(-1)
        wu = np.asarray(w_u)[0].reshape(-1)
        wv = np.asarray(w_v)[0].reshape(-1)
        im = np.asarray(img)[0, 0]
        ref = (wv * (wu * im[ivf, iuf]
                     + (1 - wu) * im[ivf, np.clip(iuf + 1, 0, W - 1)])
               + (1 - wv) * (wu * im[np.clip(ivf + 1, 0, H - 1), iuf]
                             + (1 - wu) * im[np.clip(ivf + 1, 0, H - 1),
                                             np.clip(iuf + 1, 0, W - 1)]))
        ok = np.allclose(o, ref, atol=1e-5)
        dt = timeit(jitted, img, uf, vf, w_u, w_v, iters=10)
        print(f"P3 warp tile kernel: ok={ok} {dt*1e3:.2f}ms for 32 frames "
              f"(vs ~32ms XLA patch gather)")
    except Exception as e:
        import traceback
        print(f"P3 warp tile FAILED: {type(e).__name__}: {str(e)[:300]}")
        traceback.print_exc()


def p4_gather_dtype():
    """XLA patch-gather (the current production path) cost by dtype."""
    b, n, h, w = 8, 4, 128, 512
    rng = np.random.RandomState(3)
    idx = jnp.asarray(rng.randint(0, h * w, (b, n, h * w, 1)), jnp.int32)
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16"),
                        (jnp.int8, "int8")):
        tbl = jnp.asarray(
            (rng.rand(b, n, h * w, 64) * 100).astype(np.float32)).astype(dtype)

        def run(tbl, idx):
            return jnp.take_along_axis(tbl, idx, axis=2)

        dt = timeit(jax.jit(run), tbl, idx, iters=10)
        nidx = b * n * h * w
        print(f"P4 gather {name}: {dt*1e3:.2f}ms "
              f"({dt/nidx*1e9:.1f} ns/idx)")


if __name__ == "__main__":
    p1_lane_gather()
    p2_wide_idx()
    p4_gather_dtype()
    p3_warp_tile()
