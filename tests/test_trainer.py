"""Plan-driven trainer tests: multi-stage runs, resume, checkpoints.

Exercises the capability of /root/reference/model/model_main.py:20-56 on
synthetic data: staged training with different net sets, history-based
stage skipping, per-net checkpoint handoff between stages.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from xpt_mde_tpu.config import SCALE_WEIGHT_T1 as SW, Config, TrainStage
from xpt_mde_tpu.data import SyntheticDataset
from xpt_mde_tpu.training.checkpoint import read_previous_epoch
from xpt_mde_tpu.training.trainer import train_by_plan


def synthetic_factory(dataset_name, split, batch_size):
    n = 3 if split == "train" else 1
    return SyntheticDataset(batch_size=batch_size, height=32, width=64,
                            num_batches=n, seed=0 if split == "train" else 9)


def make_cfg(tmp_path, plan):
    return Config(
        stereo=False, per_replica_batch=2, compute_dtype="float32",
        augment_probs={}, datapath=str(tmp_path), ckpt_name="test01",
        training_plan=plan,
    )


@pytest.mark.slow
def test_two_stage_plan_with_resume(tmp_path):
    nets = {"depth": "DepthNetBasic", "camera": "PoseNetImproved"}
    plan = [
        TrainStage(nets, "synthetic", 1, 1e-4, {"L1": 1.0}, SW, True),
        TrainStage(nets, "synthetic", 1, 1e-4, {"L1": 0.5, "SSIM": 0.5,
                                                "smoothe": 1.0}, SW, True),
    ]
    cfg = make_cfg(tmp_path, plan)
    train_by_plan(cfg, synthetic_factory)

    ckpt_dir = Path(cfg.datapath_ckp) / cfg.ckpt_name
    hist = (ckpt_dir / "history.csv").read_text().strip().splitlines()
    assert len(hist) == 3  # header + 2 epochs
    assert read_previous_epoch(ckpt_dir) == 2
    # per-net weights + stage checkpoints exist
    assert (ckpt_dir / "depthnet_latest.msgpack").is_file()
    assert (ckpt_dir / "posenet_latest.msgpack").is_file()
    assert (ckpt_dir / "depthnet_ep01.msgpack").is_file()
    assert (ckpt_dir / "depthnet_ep02.msgpack").is_file()
    assert (ckpt_dir / "history.png").is_file()
    assert (ckpt_dir / "config_snapshot.json").is_file()

    # rerun: both stages must be skipped instantly
    train_by_plan(cfg, synthetic_factory)
    hist2 = (ckpt_dir / "history.csv").read_text().strip().splitlines()
    assert len(hist2) == 3  # unchanged

    # extending the plan trains only the new stage
    plan3 = plan + [TrainStage(nets, "synthetic", 1, 1e-5, {"L1": 1.0},
                               SW, False)]
    cfg3 = make_cfg(tmp_path, plan3)
    train_by_plan(cfg3, synthetic_factory)
    hist3 = (ckpt_dir / "history.csv").read_text().strip().splitlines()
    assert len(hist3) == 4


@pytest.mark.slow
def test_config_drift_detection(tmp_path):
    nets = {"depth": "DepthNetBasic", "camera": "PoseNetBasic"}
    plan = [TrainStage(nets, "synthetic", 1, 1e-4, {"L1": 1.0}, SW, False)]
    cfg = make_cfg(tmp_path, plan)
    train_by_plan(cfg, synthetic_factory)

    from xpt_mde_tpu.utils.util_class import WrongInputError
    cfg2 = make_cfg(tmp_path, plan)
    cfg2.min_depth = 0.5  # drift in a fixed option
    cfg2.training_plan = plan + plan
    with pytest.raises(WrongInputError):
        train_by_plan(cfg2, synthetic_factory)


@pytest.mark.slow
def test_multi_dataset_plan_with_different_resolutions(tmp_path):
    """TRAINING_PLAN_28-style dataset switching: stages train on datasets
    with different image sizes, sharing net weights across stages."""
    nets = {"depth": "DepthNetBasic", "camera": "PoseNetImproved"}
    plan = [
        TrainStage(nets, "synthetic_small", 1, 1e-4, {"L1": 1.0}, SW, True),
        TrainStage(nets, "synthetic_wide", 1, 1e-4, {"L1": 1.0}, SW, True),
    ]
    cfg = make_cfg(tmp_path, plan)

    def factory(name, split, batch_size):
        hw = {"synthetic_small": (32, 64), "synthetic_wide": (32, 96)}[name]
        return SyntheticDataset(batch_size=batch_size, height=hw[0],
                                width=hw[1], num_batches=2)

    train_by_plan(cfg, factory)
    ckpt_dir = Path(cfg.datapath_ckp) / cfg.ckpt_name
    hist = (ckpt_dir / "history.csv").read_text().strip().splitlines()
    assert len(hist) == 3  # both stages trained
    assert (ckpt_dir / "depthnet_ep02.msgpack").is_file()


def test_full_state_resume_is_stage_scoped(tmp_path):
    """A trainstate checkpoint from stage N must NOT 'exactly resume'
    into stage N+1 even when the net/optimizer trees match -- each stage
    starts a fresh optimizer (reference stage-handoff semantics)."""
    import jax
    import jax.numpy as jnp

    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training.checkpoint import CheckpointManager
    from xpt_mde_tpu.training import create_train_state, optimizer_factory

    model = ModelFactory(["image", "intrinsic"],
                         {"depth": "DepthNetBasic", "camera": "PoseNetBasic"},
                         stereo=False).get_model()
    feats = {"image5d": jnp.zeros((1, 5, 32, 64, 3)),
             "intrinsic": jnp.eye(3)[None]}
    tx = optimizer_factory("adam_constant", 1e-4)
    state = create_train_state(model, feats, tx)
    ckpt = CheckpointManager(tmp_path)
    ckpt.save(state, "latest", stage_idx=0)

    fresh = create_train_state(model, feats, tx)
    assert ckpt.restore_full(fresh, stage_idx=0) is not None  # same stage
    assert ckpt.restore_full(fresh, stage_idx=1) is None      # next stage
    # per-net weights still load for the stage handoff
    _, loaded = ckpt.restore_params(fresh)
    assert loaded


def test_full_state_resume_migrates_pre_stage_checkpoints(tmp_path):
    """trainstate checkpoints written before the stage-scoping change
    carry no 'stage' key; restore_full must still exact-resume them
    (assumed same-stage) instead of silently dropping to per-net weights
    with a fresh optimizer."""
    import flax
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training import create_train_state, optimizer_factory
    from xpt_mde_tpu.training.checkpoint import CheckpointManager

    model = ModelFactory(["image", "intrinsic"],
                         {"depth": "DepthNetBasic", "camera": "PoseNetBasic"},
                         stereo=False).get_model()
    feats = {"image5d": jnp.zeros((1, 5, 32, 64, 3)),
             "intrinsic": jnp.eye(3)[None]}
    tx = optimizer_factory("adam_constant", 1e-4)
    state = create_train_state(model, feats, tx).replace(step=7)

    # write a v0 (pre-stage-scoping) trainstate by hand: no "stage" key
    full = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    if state.batch_stats is not None:
        full["batch_stats"] = state.batch_stats
    ckpt_dir = tmp_path
    (ckpt_dir / "trainstate_latest.msgpack").write_bytes(
        flax.serialization.to_bytes(full))

    fresh = create_train_state(model, feats, tx)
    restored = CheckpointManager(ckpt_dir).restore_full(fresh, stage_idx=2)
    assert restored is not None
    assert int(restored.step) == 7
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(restored.params)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_a, leaves_b))


def test_save_log_survives_empty_history_csv(tmp_path):
    """A crash can leave history.csv present but empty; the next epoch's
    save_log must rewrite it as a fresh file, not IndexError."""
    from xpt_mde_tpu.training.logger import TrainingLogger

    (tmp_path / "history.csv").write_text("")
    logger = TrainingLogger(tmp_path)
    logger.save_log(0, {"loss": 1.0}, {"loss": 2.0})
    lines = (tmp_path / "history.csv").read_text().strip().splitlines()
    assert lines[0].startswith("epoch")
    assert len(lines) == 2


def test_inspect_model_printout(capsys):
    """inspect_model prints depth/flow quantiles + pose rows at the 3
    strided steps only (train_val.py:239-264)."""
    from xpt_mde_tpu.training.trainer import inspect_model

    rng = np.random.RandomState(0)
    preds = {"depth_ms": [rng.rand(2, 8, 16, 1) * 10 for _ in range(4)],
             "flow_ms": [rng.randn(2, 4, 8, 16, 2)],
             "pose": rng.randn(2, 4, 6)}
    features = {"pose_gt": np.tile(np.eye(4), (2, 4, 1, 1))}

    assert inspect_model(preds, features, step=0, steps_per_epoch=30)
    out = capsys.readouterr().out
    for tag in ("depth0", "depth3", "flow0", "pose_pr", "pose_gt"):
        assert tag in out
    assert "T_LR_pr" not in out  # no stereo pose in preds

    # stride = 30 // 3 = 10: steps 1..9 are silent, 10 prints
    assert not inspect_model(preds, features, step=7, steps_per_epoch=30)
    assert capsys.readouterr().out == ""
    assert inspect_model(preds, features, step=10, steps_per_epoch=30)


@pytest.mark.slow
def test_inspect_model_in_training(tmp_path, capsys):
    """cfg.inspect_model=True traces value distributions during the epoch
    via an extra jitted forward on the inspected batches."""
    nets = {"depth": "DepthNetBasic", "camera": "PoseNetImproved"}
    plan = [TrainStage(nets, "synthetic", 1, 1e-4, {"L1": 1.0}, SW, False)]
    cfg = Config(stereo=False, per_replica_batch=2, compute_dtype="float32",
                 augment_probs={}, datapath=str(tmp_path), ckpt_name="test01",
                 training_plan=plan, inspect_model=True)
    train_by_plan(cfg, synthetic_factory)
    out = capsys.readouterr().out
    assert "depth0" in out and "pose_pr" in out
