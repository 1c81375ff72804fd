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


def test_chunked_predictions_match_monolithic(tmp_path):
    """predict_dataset_chunked under a tiny host budget writes part
    files whose streamed evaluation equals the monolithic path
    (VERDICT r2 weak #8) -- fast, no training: random-weight model."""
    import jax
    import jax.numpy as jnp

    from xpt_mde_tpu.evaluate.evaluate_main import (
        evaluate_npz, has_predictions, predict_dataset,
        predict_dataset_chunked, prediction_parts, save_predictions)
    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training import create_train_state, optimizer_factory
    from xpt_mde_tpu.training.train_step import make_predict_step

    data = SyntheticDataset(batch_size=2, height=32, width=64,
                            num_batches=4, seed=5)
    model = ModelFactory(data.config_keys(), NETS,
                         stereo=False).get_model()
    batch = {k: jnp.asarray(v) for k, v in next(iter(data)).items()}
    state = create_train_state(model, batch,
                               optimizer_factory("adam_constant", 1e-4))
    predict = make_predict_step(model)

    mono = predict_dataset(model, state, data, predict)
    save_predictions(mono, tmp_path / "mono", "split")

    # ~1 batch of float depth+image comfortably exceeds 64 KB -> parts
    paths = predict_dataset_chunked(model, state, data, predict,
                                    tmp_path / "chunk", "split",
                                    flush_bytes=64 * 1024)
    assert len(paths) > 1
    assert has_predictions(tmp_path / "chunk" / "split.npz")
    assert not (tmp_path / "chunk" / "split.npz").exists()

    streamed = {}
    for part in prediction_parts(tmp_path / "chunk" / "split.npz"):
        for key, val in part.items():
            streamed.setdefault(key, []).append(val)
    for key in mono:
        np.testing.assert_array_equal(
            np.concatenate(streamed[key], axis=0), mono[key])

    s_mono = evaluate_npz(tmp_path / "mono" / "split.npz",
                          tmp_path / "eval_mono", "split")
    s_chunk = evaluate_npz(tmp_path / "chunk" / "split.npz",
                           tmp_path / "eval_chunk", "split")
    assert s_mono.keys() == s_chunk.keys()
    for key in s_mono:
        assert np.isclose(s_mono[key], s_chunk[key], rtol=1e-6), key

    # a split that fits one chunk keeps the legacy single-file layout
    paths1 = predict_dataset_chunked(model, state, data, predict,
                                     tmp_path / "one", "split",
                                     flush_bytes=1 << 30)
    assert [p.name for p in paths1] == ["split.npz"]

    # a part series is only complete with its marker (ADVICE r3): a
    # predict run killed between flushes must read as ABSENT, not done
    marker = tmp_path / "chunk" / "split.parts.json"
    assert marker.exists() and paths[-1] == marker
    marker_bytes = marker.read_bytes()
    marker.unlink()
    assert not has_predictions(tmp_path / "chunk" / "split.npz")
    with pytest.raises(FileNotFoundError):
        list(prediction_parts(tmp_path / "chunk" / "split.npz"))
    # marker present but a part missing -> loud corruption error
    marker.write_bytes(marker_bytes)
    paths[-2].unlink()
    with pytest.raises(FileNotFoundError, match="corrupt"):
        has_predictions(tmp_path / "chunk" / "split.npz")
