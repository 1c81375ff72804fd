"""Interpret-mode parity tests: Pallas matmul-warp vs ops.warp sampler.

The kernel must match ops.warp.bilinear_sample (the semantic reference,
itself pinned to /root/reference/model/synthesize/bilinear_interp.py)
in values AND in coordinate gradients; its image cotangent is zero by
contract (const-src only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpt_mde_tpu.ops.pallas.warp import (bilinear_sample_const_src,
                                         supported)
from xpt_mde_tpu.ops.warp import bilinear_sample


def _case(batch=1, numsrc=2, height=16, width=128, channels=3, seed=0,
          spread=1.0):
    rng = np.random.RandomState(seed)
    image = jnp.asarray(
        rng.rand(batch, numsrc, height, width, channels)
        .astype(np.float32) * 2 - 1)
    # coords spanning in-bounds, out-of-bounds and border-exact pixels
    u = rng.uniform(-4, width + 4, (batch, numsrc, 1, height * width))
    v = rng.uniform(-4, height + 4, (batch, numsrc, 1, height * width))
    if spread < 1.0:  # mostly-coherent coords, like real training
        gu, gv = np.meshgrid(np.arange(width), np.arange(height))
        grid = np.stack([gu.ravel(), gv.ravel()])[None, None]
        u = grid[:, :, :1] + (u - grid[:, :, :1]) * spread
        v = grid[:, :, 1:] + (v - grid[:, :, 1:]) * spread
    coords = jnp.asarray(np.concatenate([u, v], axis=2).astype(np.float32))
    mask = jnp.asarray(
        (rng.rand(batch, height, width, 1) > 0.2).astype(np.float32))
    return image, coords, mask


@pytest.mark.parametrize("use_mask", [False, True])
@pytest.mark.parametrize("spread", [1.0, 0.1])
def test_matmul_warp_matches_xla_sampler(use_mask, spread):
    image, coords, mask = _case(spread=spread)
    m = mask if use_mask else None
    ref = bilinear_sample(image, coords, m)
    got = bilinear_sample_const_src(image, coords, m, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_matmul_warp_homogeneous_coords():
    image, coords, mask = _case()
    ones = jnp.ones_like(coords[:, :, :1])
    coords3 = jnp.concatenate([coords, ones], axis=2)
    ref = bilinear_sample(image, coords3, mask)
    got = bilinear_sample_const_src(image, coords3, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("use_mask", [False, True])
def test_matmul_warp_coord_grads_match(use_mask):
    image, coords, mask = _case(seed=3, spread=0.3)
    m = mask if use_mask else None

    def loss_ref(c):
        return jnp.sum(bilinear_sample(image, c, m) ** 2)

    def loss_pal(c):
        return jnp.sum(
            bilinear_sample_const_src(image, c, m, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref)(coords)
    g_pal = jax.grad(loss_pal)(coords)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_matmul_warp_image_cotangent_is_zero():
    image, coords, _ = _case(seed=4)

    def loss(img):
        return jnp.sum(bilinear_sample_const_src(img, coords,
                                                 interpret=True))

    g = jax.grad(loss)(image)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_supported_gate():
    assert supported((8, 4, 128, 512, 3))       # low-res full scale
    assert supported((8, 4, 64, 256, 3))        # low-res half scale
    # high-res full scale: bf16 MACs lose to the gather, int8 wins
    assert not supported((4, 4, 256, 1024, 3), mode="bf16")
    assert supported((4, 4, 256, 1024, 3), mode="int8")
    assert not supported((8, 4, 128, 500, 3))   # non-128-multiple width
    assert not supported((8, 4, 12, 512, 3))    # rows not tile-divisible


def test_const_src_flag_falls_back_on_cpu():
    """On the CPU backend const_src must silently use the XLA path."""
    image, coords, mask = _case(seed=7)
    ref = bilinear_sample(image, coords, mask)
    got = bilinear_sample(image, coords, mask, const_src=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_flow_warp_const_src_grads_interpret(monkeypatch):
    """Loss-side flow warp: grads w.r.t. the FLOW must match the XLA
    sampler when routed through the const-src Pallas kernel."""
    import xpt_mde_tpu.ops.pallas.warp as pw
    from xpt_mde_tpu.ops.flow_warp import flow_bilinear_sample

    rng = np.random.RandomState(11)
    bn, h, w = 2, 16, 128
    image = jnp.asarray(rng.rand(bn, h, w, 3).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-3, 3, (bn, h, w, 2))
                       .astype(np.float32))

    def loss_xla(f):
        return jnp.sum(flow_bilinear_sample(image, f) ** 2)

    g_ref = jax.grad(loss_xla)(flow)

    # route const_src through the interpret-mode Pallas kernel
    import functools

    import xpt_mde_tpu.ops.warp as ow
    monkeypatch.setattr(ow.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        pw, "bilinear_sample_const_src",
        functools.partial(pw.bilinear_sample_const_src, interpret=True))

    def loss_pal(f):
        return jnp.sum(flow_bilinear_sample(image, f, const_src=True) ** 2)

    # "exact" mode: 3-term bf16 split, image error ~2e-7 -> tight match
    monkeypatch.setattr(ow, "CONST_SRC_MODE", "exact")
    g_pal = jax.grad(loss_pal)(flow)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)

    # int8 default: arbitrary-float image quantized onto the uint8 grid
    # (<= 1/255 per value); grad w.r.t. flow carries ~C * 2/255 of that
    monkeypatch.setattr(ow, "CONST_SRC_MODE", "int8")
    g_int8 = jax.grad(loss_pal)(flow)
    np.testing.assert_allclose(np.asarray(g_int8), np.asarray(g_ref),
                               atol=0.05, rtol=0.05)


def test_int8_mode_exact_on_uint8_grid():
    """int8 mode quantizes onto the uint8 pixel grid (q = u - 128):
    images that came from uint8 pixels sample EXACTLY; arbitrary floats
    stay within half a uint8 step (1/255 in [-1, 1] units)."""
    rng = np.random.RandomState(3)
    b, n, h, w, c = 1, 2, 16, 128, 3
    u8 = rng.randint(0, 256, (b, n, h, w, c)).astype(np.float32)
    image = jnp.asarray(u8 / 127.5 - 1.0)
    _, coords, mask = _case(batch=b, numsrc=n, height=h, width=w, seed=3)
    ref = bilinear_sample(image, coords, mask)
    got = bilinear_sample_const_src(image, coords, mask, mode="int8",
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=0)

    off_grid, coords2, mask2 = _case(seed=4)
    ref2 = bilinear_sample(off_grid, coords2, mask2)
    got2 = bilinear_sample_const_src(off_grid, coords2, mask2, mode="int8",
                                     interpret=True)
    assert float(jnp.abs(got2 - ref2).max()) <= 1.0 / 255.0 + 1e-6


def test_int8_mode_coord_grads_match():
    image, coords, mask = _case(seed=5)

    def loss(cc, mode):
        return jnp.sum(bilinear_sample_const_src(
            image, cc, mask, mode=mode, interpret=True) ** 2)

    g_int8 = jax.grad(lambda cc: loss(cc, "int8"))(coords)
    g_ref = jax.grad(lambda cc: loss(cc, "exact"))(coords)
    np.testing.assert_allclose(np.asarray(g_int8), np.asarray(g_ref),
                               atol=5e-2, rtol=1e-2)
