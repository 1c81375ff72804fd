"""End-to-end ON-CHIP proof over the checked-in real-format KITTI
sample: reader -> shards -> native loader -> plan training (bf16,
Pallas warp) -> prediction -> Eigen-metric evaluation, all on the real
TPU. The CPU twin of this flow is tests/test_full_stack.py; this
script exists to show the whole product surface runs on hardware.

Run: python benchmarks/check_e2e_tpu.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from xpt_mde_tpu.config import (SCALE_WEIGHT_T1 as SW, Config, TestStage,
                                TrainStage)

KITTI_MINI = Path(__file__).resolve().parent.parent \
    / "tests" / "fixtures" / "kitti_mini"
DATE, DRIVE = "2011_09_26", "0001"
NETS = {"depth": "DepthNetBasic", "camera": "PoseNetImproved"}


def main():
    from xpt_mde_tpu.data.shard_maker import (ShardMaker,
                                              generate_validation_shards)
    from xpt_mde_tpu.evaluate.evaluate_main import (evaluate_by_plan,
                                                    predict_by_plan)
    from xpt_mde_tpu.training.trainer import train_by_plan

    tmp = Path(tempfile.mkdtemp(prefix="xpt_e2e_tpu_"))
    cfg = Config(
        stereo=True, per_replica_batch=2, compute_dtype="bfloat16",
        augment_probs={"CropAndResize": 0.3, "HorizontalFlip": 0.3,
                       "ColorJitter": 0.3},
        datapath=str(tmp), ckpt_name="e2e_tpu",
        image_size_overrides={"kitti_raw": (32, 96)},
        validation_frames=2,
        training_plan=[TrainStage(NETS, "kitti_raw", 1, 1e-4,
                                  {"L1": 0.5, "SSIM": 0.5, "smoothe": 1.0,
                                   "stereoL1": 0.5, "stereoPose": 1.0},
                                  SW, True)],
        test_plan=[TestStage(NETS, "kitti_raw", ["depth", "pose"],
                             "e2e_tpu", "latest")],
    )

    keys = ["image", "intrinsic", "depth_gt", "pose_gt", "image_R",
            "intrinsic_R", "stereo_T_LR"]
    ShardMaker(cfg, "kitti_raw", "train", KITTI_MINI, data_keys=keys,
               drives=[(DATE, DRIVE)]).make()
    generate_validation_shards(cfg, "kitti_raw")
    shutil.copytree(Path(cfg.datapath_shd) / "kitti_raw_train",
                    Path(cfg.datapath_shd) / "kitti_raw_test")
    print("[e2e] shards built", flush=True)

    train_by_plan(cfg)
    hist = (Path(cfg.datapath_ckp) / "e2e_tpu" / "history.csv") \
        .read_text().splitlines()
    print(f"[e2e] trained: {hist[-1][:120]}", flush=True)

    predict_by_plan(cfg)
    npz = Path(cfg.datapath_prd) / "e2e_tpu" / "kitti_raw_latest.npz"
    results = dict(np.load(npz))
    print(f"[e2e] predicted: depth {results['depth'].shape}", flush=True)

    evaluate_by_plan(cfg)
    merged = Path(cfg.datapath_evl) / "merged_result.csv"
    print("[e2e] merged_result.csv:", flush=True)
    print(merged.read_text(), flush=True)
    ok = np.isfinite(results["depth"]).all()
    print(f"e2e on-chip: ok={ok}", flush=True)


if __name__ == "__main__":
    main()
