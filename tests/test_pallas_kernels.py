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
