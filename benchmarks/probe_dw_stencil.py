"""Probe: depthwise-conv formulations on the real chip.

lax's grouped-conv depthwise measured ~3x off the padded-HBM floor
(probe_packed_backbone.py: dw144 @ [4,128,512] fwd 1.05 ms; floor with
256-lane padding ~0.33 ms). Candidates, all on the native NHWC layout:

  lax      : conv_general_dilated, feature_group_count=C (current)
  fma      : k^2 shifted multiply-adds (pad + slice views, XLA fusion)
  pallas   : whole-frame stencil kernel, grid over batch, one VMEM
             read + write per frame (shape-limited: frame must fit VMEM)

    python benchmarks/probe_dw_stencil.py
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


def dw_lax(x, k, stride=1):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dw_fma(x, k, stride=1):
    """k^2 shifted FMAs on the native layout (SAME, stride 1 only)."""
    assert stride == 1
    kh = k.shape[0]
    pad = kh // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    acc = None
    for u in range(kh):
        for v in range(kh):
            t = jax.lax.dynamic_slice(
                xp, (0, u, v, 0), (x.shape[0], h, w, x.shape[3])) * k[u, v, 0]
            acc = t if acc is None else acc + t
    return acc


def _dw_kernel(x_ref, k_ref, o_ref, *, kh):
    x = x_ref[0]          # [H, W, C]
    k = k_ref[...]        # [kh, kh, C]
    h, w, c = x.shape
    pad = kh // 2
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    acc = None
    for u in range(kh):
        for v in range(kh):
            t = jax.lax.slice(xp, (u, v, 0), (u + h, v + w, c)) * k[u, v]
            acc = t if acc is None else acc + t
    o_ref[0] = acc


def dw_pallas(x, k, stride=1):
    assert stride == 1
    b, h, w, c = x.shape
    kh = k.shape[0]
    kern = functools.partial(_dw_kernel, kh=kh)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((kh, kh, c), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
    )(x, k[:, :, 0, :])


def main():
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}")
    for c, b, h, w, kh, tag in [
            (144, 8, 64, 256, 3, "dw144_k3_lowres_b8"),
            (240, 8, 32, 128, 5, "dw240_k5_lowres_b8"),
            (48, 8, 64, 256, 3, "dw48_k3_lowres_b8")]:
        x = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32) * 2 - 1,
                        jnp.bfloat16)
        k = jnp.asarray(rng.rand(kh, kh, 1, c).astype(np.float32),
                        jnp.bfloat16)
        ref = dw_lax(x.astype(jnp.float32), k.astype(jnp.float32))
        outs = {}
        for name, fn in [("lax", dw_lax), ("fma", dw_fma),
                         ("pallas", dw_pallas)]:
            try:
                got = fn(x.astype(jnp.float32), k.astype(jnp.float32))
                err = float(jnp.max(jnp.abs(got - ref)))
                t = timeit(fn, x, k)
                outs[name] = (t, err)
            except Exception as e:  # noqa: BLE001 - probe tool
                outs[name] = (float("nan"), str(e)[:80])
        line = "  ".join(f"{n} {v[0]*1e3:.3f} ms (err {v[1]})"
                         if isinstance(v[1], float)
                         else f"{n} FAILED: {v[1]}" for n, v in outs.items())
        print(f"{tag}: {line}", flush=True)


if __name__ == "__main__":
    main()
