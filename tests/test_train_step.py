"""End-to-end train-slice test: the ONE-model milestone (SURVEY.md §7.3).

Small DepthNetBasic + PoseNetImproved on the synthetic dataset: the
jitted train step must run, produce finite metrics, and decrease the
photometric loss over a handful of steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpt_mde_tpu import config as cfg
from xpt_mde_tpu.data import SyntheticDataset
from xpt_mde_tpu.losses import loss_factory
from xpt_mde_tpu.models import ModelFactory
from xpt_mde_tpu.training import (augmentation_factory, create_train_state,
                                  make_eval_step, make_train_step,
                                  optimizer_factory)


def _to_jnp(feats):
    return {k: jnp.asarray(v) for k, v in feats.items()}


@pytest.fixture(scope="module")
def slice_parts():
    data = SyntheticDataset(batch_size=2, height=32, width=64, num_batches=4)
    factory = ModelFactory(data.config_keys(),
                           {"depth": "DepthNetBasic", "camera": "PoseNetImproved"},
                           stereo=False)
    model = factory.get_model()
    total_loss = loss_factory(data.config_keys(),
                              {"L1": 0.5, "SSIM": 0.5, "smoothe": 1.0},
                              cfg.SCALE_WEIGHT_T1, stereo=False)
    batch = _to_jnp(next(iter(data)))

    def fresh_state():
        # train steps donate their input state; every test needs its own
        tx = optimizer_factory("adam_constant", 1e-4)
        return create_train_state(model, batch, tx)

    return data, model, total_loss, fresh_state, batch


def test_train_step_runs_and_loss_decreases(slice_parts):
    data, model, total_loss, fresh_state, batch = slice_parts
    state = fresh_state()
    step = make_train_step(model, total_loss)
    rng = jax.random.PRNGKey(0)

    losses = []
    for i in range(12):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert "loss/L1" in metrics and "depth_abs_rel" in metrics
    assert np.isfinite(float(metrics["trj_err"]))


def test_eval_step_matches_loss(slice_parts):
    data, model, total_loss, fresh_state, batch = slice_parts
    state = fresh_state()
    eval_step = make_eval_step(model, total_loss)
    metrics = eval_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_with_augmentation(slice_parts):
    data, model, total_loss, fresh_state, batch = slice_parts
    augmenter = augmentation_factory(
        {"CropAndResize": 0.5, "HorizontalFlip": 0.5, "ColorJitter": 0.5})
    step = make_train_step(model, total_loss, augmenter=augmenter)
    state2, metrics = step(fresh_state(), batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_frozen_net_not_updated(slice_parts):
    data, model, total_loss, fresh_state, batch = slice_parts
    tx = optimizer_factory("adam_constant", 1e-3, frozen_nets=["posenet"])
    state = create_train_state(model, batch, tx)
    step = make_train_step(model, total_loss)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                    state.params["posenet"])
    before_d = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                      state.params["depthnet"])
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    after = state.params["posenet"]
    after_d = state.params["depthnet"]
    leaves_same = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), before, after)
    assert all(jax.tree_util.tree_leaves(leaves_same))
    leaves_diff = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        before_d, after_d)
    assert any(jax.tree_util.tree_leaves(leaves_diff))


def test_grad_accum_matches_full_batch(slice_parts):
    """k-microbatch accumulation == one full-batch step for BN-free
    models (train_step.py grad_accum_steps contract). SGD so the update
    is linear in the grads (adam's moments would amplify float-order
    noise past any clean tolerance)."""
    data, model, _, fresh_state, batch = slice_parts
    total_loss = loss_factory(data.config_keys(),
                              {"L1": 0.5, "SSIM": 0.5, "smoothe": 1.0},
                              cfg.SCALE_WEIGHT_T1, stereo=False,
                              batch_size=2)
    import optax

    def sgd_state():
        return create_train_state(model, batch, optax.sgd(1e-2))

    rng = jax.random.PRNGKey(3)
    step_full = make_train_step(model, total_loss)
    step_accum = make_train_step(model, total_loss, grad_accum_steps=2)
    s_full, m_full = step_full(sgd_state(), batch, rng)
    s_acc, m_acc = step_accum(sgd_state(), batch, rng)

    np.testing.assert_allclose(float(m_acc["loss"]), float(m_full["loss"]),
                               rtol=1e-5)
    for key in m_full:
        assert key in m_acc, key
    flat_f = jax.tree_util.tree_leaves_with_path(s_full.params)
    flat_a = dict(jax.tree_util.tree_leaves_with_path(s_acc.params))
    for path, leaf in flat_f:
        np.testing.assert_allclose(np.asarray(flat_a[path]), np.asarray(leaf),
                                   rtol=2e-4, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(path))


def test_grad_accum_guards(slice_parts):
    data, model, total_loss_nobs, fresh_state, batch = slice_parts
    with pytest.raises(ValueError, match="batch_size"):
        make_train_step(model, total_loss_nobs, grad_accum_steps=2)
    total_loss = loss_factory(data.config_keys(), {"L1": 1.0},
                              cfg.SCALE_WEIGHT_T1, stereo=False, batch_size=2)
    with pytest.raises(ValueError):
        make_train_step(model, total_loss, grad_accum_steps=0)
    step = make_train_step(model, total_loss, grad_accum_steps=3, jit=False)
    with pytest.raises(ValueError, match="divide"):
        step(fresh_state(), batch, jax.random.PRNGKey(0))
