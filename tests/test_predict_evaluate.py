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

    from xpt_mde_tpu.evaluate.evaluate_debug import evaluate_for_debug
    out = evaluate_for_debug(npz, tmp_path / "debug", worst_n=2)
    assert len(out["rows"]) == 4
    assert "abs_rel" in out["worst"]
    assert (tmp_path / "debug" / "debug_metrics.csv").exists()
    assert len(list((tmp_path / "debug").glob("worst_abs_rel/*.png"))) == 2

    from xpt_mde_tpu.evaluate.visualize import compare_depths
    compare_depths(npz, tmp_path / "cmp", stride=2)
    assert len(list((tmp_path / "cmp").glob("*.png"))) == 2
