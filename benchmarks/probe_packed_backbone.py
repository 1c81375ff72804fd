"""Probe: packed (space-to-depth) formulations of the EfficientNet early
blocks vs the current XLA lowering, on the real chip.

The high-res b4 step trace shows BatchNorm at 29 ms/step and depthwise
convs at 13.6 ms/step (~0.1 TF/s) -- both dominated by lane padding of
C=24..64 activations to 128 lanes. Candidates measured here (all exact
reformulations):

  dw-conv   : lax grouped conv (current)  vs  9-term shifted-FMA in the
              block-major packed domain
  batchnorm : flax-style train-mode BN on [B,H,W,C]  vs  stat-tied BN on
              packed [B,H/2,W/2,4C]
  1x1 conv  : nn.Conv on [B,H,W,Cin]  vs  feature_group_count=4 grouped
              conv on packed input (same weights tiled)

    python benchmarks/probe_packed_backbone.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.kernel_bench import timeit
from xpt_mde_tpu.models.layers import space_to_depth

B = 4  # high-res batch


def dw_conv(x, k):
    """Current formulation: depthwise 3x3 via feature_group_count."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dw_conv_packed(xp, k):
    """9-term shifted-FMA depthwise 3x3 on block-major packed input.

    Fine-pixel shift u in rows: fine row 2s+di+u -> cell s+(di+u)//2,
    offset (di+u)%2; realized as an offset-block permutation + cell roll.
    Zero padding at borders matches SAME semantics.
    """
    b, h, w, c4 = xp.shape
    c = c4 // 4
    # blocks[di][dj] = [B, h, w, C] fine plane at offset (di, dj)
    blocks = [[xp[..., (di * 2 + dj) * c:(di * 2 + dj) * c + c]
               for dj in range(2)] for di in range(2)]

    def shift_cells(t, du, axis):
        # roll cells by du in {-1, 0, 1} with zero fill (SAME border)
        if du == 0:
            return t
        z = jnp.zeros_like(t.take(indices=jnp.arange(1), axis=axis))
        if du == 1:  # fine index +? -> cells shifted
            return jnp.concatenate([t.take(indices=jnp.arange(1, t.shape[axis]), axis=axis), z], axis=axis)
        return jnp.concatenate([z, t.take(indices=jnp.arange(t.shape[axis] - 1), axis=axis)], axis=axis)

    out_blocks = []
    for di in range(2):
        for dj in range(2):
            acc = 0
            for u in (-1, 0, 1):
                fi = di + u  # fine offset in {-1..2}
                ci, oi = fi // 2, fi % 2
                for v in (-1, 0, 1):
                    fj = dj + v
                    cj, oj = fj // 2, fj % 2
                    src = blocks[oi][oj]
                    t = shift_cells(shift_cells(src, ci, 1), cj, 2)
                    acc = acc + t * k[u + 1, v + 1, 0]
            out_blocks.append(acc)
    return jnp.concatenate(out_blocks, axis=-1)


def bn_train(x, scale, bias):
    mu = jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2)) - mu ** 2
    inv = jax.lax.rsqrt(var + 1e-3) * scale
    return ((x.astype(jnp.float32) - mu) * inv + bias).astype(x.dtype), mu, var


def bn_train_packed(xp, scale, bias):
    b, h, w, c4 = xp.shape
    c = c4 // 4
    xr = xp.reshape(b, h, w, 4, c).astype(jnp.float32)
    mu = jnp.mean(xr, axis=(0, 1, 2, 3))
    var = jnp.mean(jnp.square(xr), axis=(0, 1, 2, 3)) - mu ** 2
    inv = jax.lax.rsqrt(var + 1e-3) * scale
    y = (xr - mu) * inv + bias
    return y.reshape(b, h, w, c4).astype(xp.dtype), mu, var


def conv1x1(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv1x1_packed(xp, w):
    # block-major packed: 4 groups each using the same [1,1,Cin,K] kernel
    wk = jnp.concatenate([w] * 4, axis=-1)  # [1,1,Cin,4K]
    return jax.lax.conv_general_dilated(
        xp, wk, (1, 1), "SAME", feature_group_count=4,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def grad_wrap(fn, argnums=0):
    def f(*args):
        def loss(*a):
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return jax.grad(loss, argnums=argnums)(*args)
    return f


def main():
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}")
    results = {}

    # ---- depthwise 3x3, stage-1 expand shape (144ch @ stem res, hi-res b4)
    for c, h, w, tag in [(144, 128, 512, "dw144_hr"), (48, 128, 512, "dw48_hr"),
                         (240, 64, 256, "dw240_hr")]:
        x = jnp.asarray(rng.rand(B, h, w, c).astype(np.float32) * 2 - 1,
                        jnp.bfloat16)
        k = jnp.asarray(rng.rand(3, 3, 1, c).astype(np.float32), jnp.bfloat16)
        xp = space_to_depth(x)
        t0 = timeit(dw_conv, x, k)
        t1 = timeit(dw_conv_packed, xp, k)
        # numeric check (f32)
        y0 = dw_conv(x.astype(jnp.float32), k.astype(jnp.float32))
        y1 = dw_conv_packed(space_to_depth(x.astype(jnp.float32)),
                            k.astype(jnp.float32))
        from xpt_mde_tpu.models.layers import depth_to_space
        err = float(jnp.max(jnp.abs(depth_to_space(y1) - y0)))
        print(f"{tag}: lax_grouped {t0*1e3:.3f} ms  packed_fma {t1*1e3:.3f} ms"
              f"  max_err {err:.2e}")
        g0 = timeit(grad_wrap(dw_conv), x, k)
        g1 = timeit(grad_wrap(dw_conv_packed), xp, k)
        print(f"{tag}-grad: lax {g0*1e3:.3f} ms  packed {g1*1e3:.3f} ms")

    # ---- train-mode BN, stage-0/1 shapes
    for c, h, w, tag in [(24, 128, 512, "bn24_hr"), (144, 128, 512, "bn144_hr"),
                         (40, 64, 256, "bn40_hr")]:
        x = jnp.asarray(rng.rand(B, h, w, c).astype(np.float32) * 2 - 1,
                        jnp.bfloat16)
        s = jnp.ones(c, jnp.float32)
        bias = jnp.zeros(c, jnp.float32)
        xp = space_to_depth(x)
        t0 = timeit(bn_train, x, s, bias)
        t1 = timeit(bn_train_packed, xp, s, bias)
        print(f"{tag}: unpacked {t0*1e3:.3f} ms  packed {t1*1e3:.3f} ms")
        g0 = timeit(grad_wrap(bn_train), x, s, bias)
        g1 = timeit(grad_wrap(bn_train_packed), xp, s, bias)
        print(f"{tag}-grad: unpacked {g0*1e3:.3f} ms  packed {g1*1e3:.3f} ms")

    # ---- 1x1 convs, expand/project shapes
    for ci, co, h, w, tag in [(24, 144, 128, 512, "pw24-144_hr"),
                              (144, 40, 64, 256, "pw144-40_hr"),
                              (40, 240, 64, 256, "pw40-240_hr")]:
        x = jnp.asarray(rng.rand(B, h, w, ci).astype(np.float32) * 2 - 1,
                        jnp.bfloat16)
        wk = jnp.asarray(rng.rand(1, 1, ci, co).astype(np.float32) * 0.1,
                         jnp.bfloat16)
        xp = space_to_depth(x)
        t0 = timeit(conv1x1, x, wk)
        t1 = timeit(conv1x1_packed, xp, wk)
        y0 = conv1x1(x.astype(jnp.float32), wk.astype(jnp.float32))
        y1 = conv1x1_packed(space_to_depth(x.astype(jnp.float32)),
                            wk.astype(jnp.float32))
        # packed output block o holds offset o of s2d(y0)
        err = float(jnp.max(jnp.abs(y1 - space_to_depth(y0))))
        print(f"{tag}: unpacked {t0*1e3:.3f} ms  packed_grouped {t1*1e3:.3f} ms"
              f"  max_err {err:.2e}")
        g0 = timeit(grad_wrap(conv1x1), x, wk)
        g1 = timeit(grad_wrap(conv1x1_packed), xp, wk)
        print(f"{tag}-grad: unpacked {g0*1e3:.3f} ms  packed {g1*1e3:.3f} ms")


if __name__ == "__main__":
    main()
