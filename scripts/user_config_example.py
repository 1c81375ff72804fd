"""User configuration template (the reference's config-example.py role).

Copy to scripts/user_config.py, set paths, pick a plan. All options live
here -- the entry scripts take zero CLI flags.
"""

from xpt_mde_tpu.config import (Config, TestStage, training_plan_28,
                                training_plan_30)

# raw dataset locations on this machine (config-example.py:5-11)
RAW_DATA_PATHS = {
    "kitti_raw": "/data/kitti_raw_data",
    "kitti_odom": "/data/kitti_odometry",
    "cityscapes": "/data/raw_zips/cityscapes",
    "waymo": "/data/waymo",
    "a2d2": "/data/raw_zips/a2d2/zips",
}

RIGID_EF5 = {"depth": "EfficientNetB5", "camera": "PoseNetImproved"}

cfg = Config(
    stereo=True,
    high_res=False,
    per_replica_batch=8,
    compute_dtype="bfloat16",
    datapath="/data/xpt_mde_tpu",
    ckpt_name="mde01",
    training_plan=training_plan_28(),
    test_plan=[
        TestStage(RIGID_EF5, "kitti_raw", ["depth"], "mde01", "latest"),
    ],
)
