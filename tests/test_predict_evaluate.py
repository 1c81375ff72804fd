"""End-to-end predict -> npz -> evaluate pipeline test (reference call
stack 3.5, SURVEY.md): train briefly on synthetic data, predict the test
split, evaluate depth + pose, check csv outputs."""

from pathlib import Path

import numpy as np
import pytest

from xpt_mde_tpu.config import (SCALE_WEIGHT_T1 as SW, Config, TestStage,
                                TrainStage)
from xpt_mde_tpu.data import SyntheticDataset
from xpt_mde_tpu.evaluate.evaluate_main import (evaluate_by_plan,
                                                merge_eval_results,
                                                predict_by_plan)
from xpt_mde_tpu.training.trainer import train_by_plan

NETS = {"depth": "DepthNetBasic", "camera": "PoseNetImproved"}


def synthetic_factory(dataset_name, split, batch_size):
    return SyntheticDataset(batch_size=batch_size, height=32, width=64,
                            num_batches=2, seed=1 if split == "test" else 0)


@pytest.mark.slow
def test_predict_and_evaluate(tmp_path):
    plan = [TrainStage(NETS, "synthetic", 1, 1e-4, {"L1": 1.0}, SW, True)]
    test_plan = [TestStage(NETS, "synthetic", ["depth", "pose"], "test01",
                           "latest")]
    cfg = Config(stereo=False, per_replica_batch=2, compute_dtype="float32",
                 augment_probs={}, datapath=str(tmp_path), ckpt_name="test01",
                 training_plan=plan, test_plan=test_plan)

    train_by_plan(cfg, synthetic_factory)
    predict_by_plan(cfg, synthetic_factory)

    npz = Path(cfg.datapath_prd) / "test01" / "synthetic_latest.npz"
    assert npz.exists()
    results = dict(np.load(npz))
    assert results["depth"].shape == (4, 32, 64, 1)
    assert results["pose"].shape == (4, 4, 6)
    assert results["depth_gt"].shape == (4, 32, 64, 1)
    assert results["pose_gt"].shape == (4, 4, 4, 4)
    assert results["image"].dtype == np.uint8

    evaluate_by_plan(cfg)
    eval_dir = Path(cfg.datapath_evl) / "test01"
    summary_file = eval_dir / "summary_synthetic_latest.csv"
    assert summary_file.exists()
    text = summary_file.read_text()
    assert "abs_rel" in text and "trj_abs_err" in text
    merged = Path(cfg.datapath_evl) / "merged_result.csv"
    assert merged.exists() and "abs_rel" in merged.read_text()

    # idempotency: second run skips cleanly
    predict_by_plan(cfg, synthetic_factory)
    evaluate_by_plan(cfg)


@pytest.mark.slow
def test_debug_evaluator_and_viz(tmp_path):
    """Debug evaluator + comparison panels over saved predictions."""
    plan = [TrainStage(NETS, "synthetic", 1, 1e-4, {"L1": 1.0}, SW, True)]
    test_plan = [TestStage(NETS, "synthetic", ["depth", "pose"], "test01",
                           "latest")]
    cfg = Config(stereo=False, per_replica_batch=2, compute_dtype="float32",
                 augment_probs={}, datapath=str(tmp_path), ckpt_name="test01",
                 training_plan=plan, test_plan=test_plan)
    train_by_plan(cfg, synthetic_factory)
    predict_by_plan(cfg, synthetic_factory)
    npz = Path(cfg.datapath_prd) / "test01" / "synthetic_latest.npz"

    from xpt_mde_tpu.evaluate.evaluate_debug import evaluate_npz_debug
    out = evaluate_npz_debug(npz, tmp_path / "debug", worst_n=2)
    assert len(out["rows"]) == 4
    assert "abs_rel" in out["worst"]
    assert (tmp_path / "debug" / "debug_metrics.csv").exists()
    assert len(list((tmp_path / "debug").glob("worst_abs_rel/*.png"))) == 2

    from xpt_mde_tpu.evaluate.visualize import compare_depths
    compare_depths(npz, tmp_path / "cmp", stride=2)
    assert len(list((tmp_path / "cmp").glob("*.png"))) == 2


@pytest.mark.slow
def test_model_driven_debug_evaluator(tmp_path):
    """Full-scope debug evaluation (evaluate_debug.py:77-131 parity):
    per-frame photometric/smooth losses, trajectory.csv, worst-frame
    inspection views, and the gt-vs-pred scale inspection mode."""
    import jax.numpy as jnp

    from xpt_mde_tpu.evaluate.evaluate_debug import (evaluate_for_debug,
                                                     inspect_batches)
    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training import (create_train_state, make_predict_step,
                                      optimizer_factory)

    loader = synthetic_factory("synthetic", "test", 2)
    keys = loader.config_keys()
    model = ModelFactory(keys, NETS, stereo=False,
                         compute_dtype="float32").get_model()
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    state = create_train_state(model, batch,
                               optimizer_factory("adam_constant", 1e-4))
    predict_step = make_predict_step(model)

    out = evaluate_for_debug(state, loader, predict_step,
                             tmp_path / "debug", worst_n=2)
    debug_dir = tmp_path / "debug"
    assert len(out["depth_rows"]) == 4          # 2 batches x batch 2
    assert len(out["pose_rows"]) == 16          # 4 frames x 4 sources
    depth_csv = (debug_dir / "debug_depth.csv").read_text()
    assert depth_csv.startswith("frame,smooth_loss,depth_err")
    pose_csv = (debug_dir / "debug_pose.csv").read_text()
    assert pose_csv.startswith("frame,srcidx,photo_loss,trj_err,distance,"
                               "rot_err")
    traj_csv = (debug_dir / "trajectory.csv").read_text().splitlines()
    assert traj_csv[0] == "frame,srcidx,tx_gt,ty_gt,tz_gt,tx_pr,ty_pr,tz_pr"
    assert len(traj_csv) == 17
    # photometric losses are finite and positive for an untrained model
    photo = [r[2] for r in out["pose_rows"]]
    assert all(np.isfinite(p) for p in photo) and max(photo) > 0
    for key in ("photo_loss", "trj_err", "rot_err", "smooth_loss"):
        assert key in out["worst"]
        assert len(list((debug_dir / f"worst_{key}").glob("*.png"))) == 2

    rows = inspect_batches(state, loader, predict_step, max_batches=1)
    assert rows and "pose_scale" in rows[0] and "depth_scale" in rows[0]
    assert np.isfinite(rows[0]["depth_scale"])
