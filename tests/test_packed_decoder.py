"""Space-to-depth packed decoder tail: exactness vs the plain path.

The packed path (models/layers.py PackedConv2D, depth_net.py packed_tail)
re-orders the fine-scale decoder math onto a 2x-coarser grid with 4x the
channels to fix TPU lane padding. It must be numerically equivalent (same
multiply-adds, f32) and share the exact parameter tree so checkpoints are
interchangeable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpt_mde_tpu.models.backbones import backbone_factory
from xpt_mde_tpu.models.depth_net import DepthNetPretrained
from xpt_mde_tpu.models.layers import (activation_factory, depth_to_space,
                                       pack_conv_kernel, space_to_depth)


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 12, 5))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_pack_conv_kernel_equivalence():
    """conv(x, w) == depth_to_space(conv(space_to_depth(x), packed w))."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 24, 7).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 7, 5).astype(np.float32) * 0.1)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    packed = jax.lax.conv_general_dilated(
        space_to_depth(x), pack_conv_kernel(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(depth_to_space(packed)),
                               np.asarray(ref), atol=1e-5, rtol=1e-5)


def _depth_net(packed):
    return DepthNetPretrained(backbone_factory("EfficientNetB0", jnp.float32),
                              activation_factory("InverseSigmoid"),
                              dtype=jnp.float32, packed_tail=packed)


def test_packed_tail_matches_plain_decoder():
    """Same params -> same multi-scale depths (f32, tight) and identical
    parameter trees (checkpoint compatibility)."""
    rng = np.random.RandomState(2)
    image5d = jnp.asarray(rng.rand(1, 5, 32, 64, 3).astype(np.float32) * 2 - 1)

    plain, packed = _depth_net(False), _depth_net(True)
    variables = plain.init(jax.random.PRNGKey(0), image5d, train=False)
    vp = packed.init(jax.random.PRNGKey(0), image5d, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(vp))
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(vp)):
        assert a.shape == b.shape

    out_a = plain.apply(variables, image5d, train=False)
    out_b = packed.apply(variables, image5d, train=False)
    for da, db in zip(out_a["depth_ms"], out_b["depth_ms"]):
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   atol=1e-4, rtol=1e-4)
    for da, db in zip(out_a["debug_out"], out_b["debug_out"]):
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow  # grad-compile heavy; forward equivalence stays
# fast-pinned by test_packed_tail_matches_plain_decoder (r5 budget)
def test_packed_tail_grads_match():
    rng = np.random.RandomState(3)
    image5d = jnp.asarray(rng.rand(1, 5, 32, 64, 3).astype(np.float32) * 2 - 1)
    plain, packed = _depth_net(False), _depth_net(True)
    variables = plain.init(jax.random.PRNGKey(0), image5d, train=False)

    def loss(params, net):
        out = net.apply({**variables, "params": params}, image5d, train=False)
        return sum(jnp.mean(jnp.log(d)) for d in out["depth_ms"])

    ga = jax.grad(loss)(variables["params"], plain)
    gb = jax.grad(loss)(variables["params"], packed)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = jax.tree_util.tree_leaves_with_path(gb)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3,
                                   err_msg=str(pa))
