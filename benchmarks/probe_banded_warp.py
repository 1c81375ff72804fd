"""Probe: banded (chunk-skipping) one-hot warp dots.

The warp kernel's column-select contracts [H, W] x [W, NPIX] per
channel — cost per output pixel grows with W. But the one-hot matrix is
BAND-STRUCTURED for real motion: target pixel p in column c samples
source u' ~ c + delta, so with the NPIX dim row-major in target
columns, only |i - j| <= band of the (W/128 x NPIX/128) chunk pairs are
non-zero. This probes an in-kernel lax.cond-gated accumulation over
128-column chunks (data-adaptive, EXACT — skipped chunks are all-zero
one-hots) against the current full-width dot, over coordinate
distributions from identity to full-random.

    python benchmarks/probe_banded_warp.py
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

from benchmarks.kernel_bench import timeit

NPIX = 1024
CHUNK = 128


def _full_kernel(img_ref, u_ref, out_ref, *, height, width, channels):
    """Current formulation: full-width int8 one-hot dots."""
    u = u_ref[0, 0]
    ufi = jnp.clip(jnp.floor(u), 0.0, width - 1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (width, NPIX), 0)
    e_f = jnp.where(cols == ufi, 1, 0).astype(jnp.int8)
    e_c = jnp.where(cols == ufi + 1, 1, 0).astype(jnp.int8)
    for c in range(channels):
        q = img_ref[0, c]
        p_f = jax.lax.dot_general(q, e_f, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        p_c = jax.lax.dot_general(q, e_c, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        out_ref[0, c, 0, 0:1] = jnp.sum(
            (p_f + p_c).astype(jnp.float32), axis=0)[None]


def _banded_kernel(img_ref, u_ref, out_ref, *, height, width, channels):
    """Chunk-gated formulation: per (output-chunk j, width-chunk i) pair
    the dot runs only when the j-chunk's coordinate range touches i."""
    u = u_ref[0, 0]
    ufi = jnp.clip(jnp.floor(u), 0.0, width - 1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (width, NPIX), 0)
    e_f = jnp.where(cols == ufi, 1, 0).astype(jnp.int8)
    e_c = jnp.where(cols == ufi + 1, 1, 0).astype(jnp.int8)
    nj = NPIX // CHUNK
    ni = width // CHUNK
    q_all = img_ref[0].reshape(channels * height, width)
    outs = []
    for j in range(nj):
        uj = jax.lax.slice(ufi, (0, j * CHUNK), (1, (j + 1) * CHUNK))
        umin = jnp.min(uj)
        umax = jnp.max(uj) + 1  # e_c selects ufi+1
        acc = jnp.zeros((channels * height, CHUNK), jnp.float32)
        for i in range(ni):
            used = (umax >= i * CHUNK) & (umin < (i + 1) * CHUNK)

            def body(a, i=i, j=j):
                ef = jax.lax.slice(e_f, (i * CHUNK, j * CHUNK),
                                   ((i + 1) * CHUNK, (j + 1) * CHUNK))
                ec = jax.lax.slice(e_c, (i * CHUNK, j * CHUNK),
                                   ((i + 1) * CHUNK, (j + 1) * CHUNK))
                q = jax.lax.slice(q_all, (0, i * CHUNK),
                                  (channels * height, (i + 1) * CHUNK))
                p_f = jax.lax.dot_general(
                    q, ef, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                p_c = jax.lax.dot_general(
                    q, ec, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return a + (p_f + p_c).astype(jnp.float32)

            acc = jax.lax.cond(used, body, lambda a: a, acc)
        outs.append(jnp.sum(acc.reshape(channels, height, CHUNK), axis=1))
    res = jnp.concatenate(outs, axis=-1)  # [C, NPIX]
    for c in range(channels):
        out_ref[0, c, 0, 0:1] = res[c][None]


def run(kernel_fn, img, u, height, width, channels):
    bn = img.shape[0]
    ntiles = height * width // NPIX
    kern = functools.partial(kernel_fn, height=height, width=width,
                             channels=channels)
    return pl.pallas_call(
        kern,
        grid=(bn, ntiles),
        in_specs=[
            pl.BlockSpec((1, channels, height, width),
                         lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, NPIX), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, channels, 1, 1, NPIX),
                               lambda b, t: (b, 0, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (bn, channels, ntiles, 1, NPIX), jnp.float32),
    )(img, u)


def main():
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}")
    for height, width, bn, tag in [(128, 512, 32, "lowres_b8x4"),
                                   (256, 1024, 16, "highres_b4x4")]:
        channels = 3
        img = rng.randint(-128, 128,
                          (bn, channels, height, width)).astype(np.int8)
        img = jnp.asarray(img)
        base = np.tile(np.arange(width, dtype=np.float32),
                       height)[None].repeat(bn, 0)  # target u per pixel
        for dist, delta in [
                ("ident", np.zeros_like(base)),
                ("pm16", rng.uniform(-16, 16, base.shape)),
                ("pm64", rng.uniform(-64, 64, base.shape)),
                ("pm192", rng.uniform(-192, 192, base.shape)),
                ("random", rng.uniform(0, width, base.shape) - base)]:
            u = jnp.asarray((base + delta).reshape(
                bn, height * width // NPIX, 1, NPIX), jnp.float32)
            ref = run(_full_kernel, img, u, height, width, channels)
            got = run(_banded_kernel, img, u, height, width, channels)
            err = float(jnp.max(jnp.abs(ref - got)))
            tf_ = timeit(lambda a, b: run(_full_kernel, a, b, height,
                                          width, channels), img, u)
            tb = timeit(lambda a, b: run(_banded_kernel, a, b, height,
                                         width, channels), img, u)
            print(f"{tag} {dist:7s}: full {tf_*1e3:7.3f} ms  "
                  f"banded {tb*1e3:7.3f} ms  ({tf_/tb:4.2f}x, err {err:.1e})",
                  flush=True)


if __name__ == "__main__":
    main()
