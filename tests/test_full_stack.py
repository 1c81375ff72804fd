"""Full-stack integration: raw KITTI tree -> shards -> native loader ->
plan training -> prediction -> evaluation, through the production
default_dataset_factory (native C++ reader + prefetch)."""

from pathlib import Path

import numpy as np
import pytest

from tests.test_data_pipeline import DATE, DRIVE, kitti_tree  # noqa: F401
from xpt_mde_tpu.config import (SCALE_WEIGHT_T1 as SW, Config, TestStage,
                                TrainStage)

NETS = {"depth": "DepthNetBasic", "camera": "PoseNetImproved"}


@pytest.mark.slow
def test_full_stack_kitti(kitti_tree, tmp_path):  # noqa: F811
    from xpt_mde_tpu.data.shard_maker import (ShardMaker,
                                              generate_validation_shards)
    from xpt_mde_tpu.evaluate.evaluate_main import (evaluate_by_plan,
                                                    predict_by_plan)
    from xpt_mde_tpu.training.trainer import train_by_plan

    cfg = Config(
        stereo=True, per_replica_batch=2, compute_dtype="float32",
        augment_probs={"CropAndResize": 0.3, "HorizontalFlip": 0.3,
                       "ColorJitter": 0.3},
        datapath=str(tmp_path), ckpt_name="fullstack",
        image_size_overrides={"kitti_raw": (32, 96)},
        validation_frames=2,
        training_plan=[TrainStage(NETS, "kitti_raw", 1, 1e-4,
                                  {"L1": 0.5, "SSIM": 0.5, "smoothe": 1.0,
                                   "stereoL1": 0.5, "stereoPose": 1.0},
                                  SW, True)],
        test_plan=[TestStage(NETS, "kitti_raw", ["depth", "pose"],
                             "fullstack", "latest")],
    )

    # data prep: train shards from the raw tree + val split; reuse the
    # train shards as the "test" split (the fake tree has no test drives)
    keys = ["image", "intrinsic", "depth_gt", "pose_gt", "image_R",
            "intrinsic_R", "stereo_T_LR"]
    ShardMaker(cfg, "kitti_raw", "train", kitti_tree, data_keys=keys,
               drives=[(DATE, DRIVE)]).make()
    generate_validation_shards(cfg, "kitti_raw")
    import shutil
    shutil.copytree(Path(cfg.datapath_shd) / "kitti_raw_train",
                    Path(cfg.datapath_shd) / "kitti_raw_test")

    # training through the production loader (native + prefetch)
    train_by_plan(cfg)
    ckpt_dir = Path(cfg.datapath_ckp) / "fullstack"
    assert (ckpt_dir / "history.csv").exists()
    hist = (ckpt_dir / "history.csv").read_text().splitlines()
    assert len(hist) == 2  # header + 1 epoch
    header = hist[0].split(",")
    assert "train_loss" in header and "val_loss" in header
    assert "train_loss_stereoL1" in header
    assert (ckpt_dir / "mean_result.csv").exists()
    assert (ckpt_dir / "how-to-read-columns.txt").exists()

    # prediction + evaluation
    predict_by_plan(cfg)
    npz = Path(cfg.datapath_prd) / "fullstack" / "kitti_raw_latest.npz"
    assert npz.exists()
    results = dict(np.load(npz))
    assert results["depth"].shape[1:] == (32, 96, 1)
    evaluate_by_plan(cfg)
    merged = Path(cfg.datapath_evl) / "merged_result.csv"
    assert merged.exists()
    text = merged.read_text()
    assert "abs_rel" in text and "trj_abs_err" in text

    # model-driven debug evaluation through the same plan walk
    from xpt_mde_tpu.evaluate.evaluate_debug import debug_by_plan
    debug_by_plan(cfg)
    debug_dir = (Path(cfg.datapath_evl) / "fullstack"
                 / "debug_kitti_raw_latest")
    assert (debug_dir / "debug_depth.csv").exists()
    assert (debug_dir / "debug_pose.csv").exists()
    assert (debug_dir / "trajectory.csv").exists()
    assert any(debug_dir.glob("worst_*/*.png"))
