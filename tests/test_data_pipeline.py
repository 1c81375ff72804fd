"""Data pipeline integration tests on a synthetic miniature KITTI tree.

Replaces the reference's cv2-window reader checks (SURVEY.md §4) with
real assertions: native KITTI parsing, snippet example assembly, shard
write/read round-trip, and the batched loader contract.
"""

import json
from pathlib import Path

import cv2
import numpy as np
import pytest

from xpt_mde_tpu.data.depth_map import point_cloud_to_depth_map
from xpt_mde_tpu.data.example_maker import ExampleMaker
from xpt_mde_tpu.data.readers.kitti_reader import KittiRawReader, oxts_to_pose
from xpt_mde_tpu.data.shard_io import (DatasetLoader, ShardDataset,
                                       ShardWriter, merge_drive_dirs)

DATE, DRIVE = "2011_09_26", "0199"
RAW_H, RAW_W = 64, 192
N_FRAMES = 12


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    base = tmp_path_factory.mktemp("kitti_raw")
    date_dir = base / DATE
    drive_dir = date_dir / f"{DATE}_drive_{DRIVE}_sync"
    fx = fy = 100.0

    # calibration files
    p02 = f"{fx} 0 {RAW_W/2} 0  0 {fy} {RAW_H/2} 0  0 0 1 0"
    p03 = f"{fx} 0 {RAW_W/2} {-fx*0.54}  0 {fy} {RAW_H/2} 0  0 0 1 0"
    (date_dir).mkdir(parents=True)
    (date_dir / "calib_cam_to_cam.txt").write_text(
        f"P_rect_02: {p02}\nP_rect_03: {p03}\n"
        "R_rect_00: 1 0 0 0 1 0 0 0 1\n")
    # velo->cam: KITTI axis permutation (cam x=-vy, y=-vz, z=vx)
    (date_dir / "calib_velo_to_cam.txt").write_text(
        "R: 0 -1 0 0 0 -1 1 0 0\nT: 0 -0.08 -0.27\n")
    (date_dir / "calib_imu_to_velo.txt").write_text(
        "R: 1 0 0 0 1 0 0 0 1\nT: -0.8 0.3 0.8\n")

    rng = np.random.RandomState(0)
    texture = rng.randint(0, 255, (RAW_H, RAW_W + 4 * N_FRAMES, 3), np.uint8)
    for cam, shift_extra in (("image_02", 0), ("image_03", 2)):
        img_dir = drive_dir / cam / "data"
        img_dir.mkdir(parents=True)
        for i in range(N_FRAMES):
            off = 4 * i + shift_extra
            frame = texture[:, off:off + RAW_W]
            cv2.imwrite(str(img_dir / f"{i:010d}.png"), frame)

    oxts_dir = drive_dir / "oxts" / "data"
    oxts_dir.mkdir(parents=True)
    for i in range(N_FRAMES):
        # forward motion ~1.1e-5 deg lat per frame ~ 1.2 m
        row = [49.0 + i * 1.1e-5, 8.43, 110.0 + 0.01 * i, 0.0, 0.0, 0.1 * 0]
        (oxts_dir / f"{i:010d}.txt").write_text(
            " ".join(str(v) for v in row) + " " + " ".join(["0"] * 24))

    velo_dir = drive_dir / "velodyne_points" / "data"
    velo_dir.mkdir(parents=True)
    pts = rng.uniform([3, -8, -1.5], [40, 8, 1.0], (3000, 3))
    velo = np.concatenate([pts, np.ones((3000, 1))], axis=1).astype(np.float32)
    for i in range(N_FRAMES):
        velo.tofile(str(velo_dir / f"{i:010d}.bin"))
    return base


def test_kitti_raw_reader(kitti_tree):
    reader = KittiRawReader("train", kitti_tree)
    reader.init_drive((DATE, DRIVE))
    ids = reader.get_range_()
    assert ids and min(ids) >= 2 and max(ids) <= N_FRAMES - 3
    img = reader.get_image(ids[0])
    assert img.shape == (RAW_H, RAW_W, 3) and img.dtype == np.uint8
    k = reader.get_intrinsic()
    assert k[0, 0] == 100.0 and k[0, 2] == RAW_W / 2
    ext = reader.get_stereo_extrinsic()
    # cam2->cam3 baseline ~0.54 m in +x
    assert np.isclose(ext[0, 3], 0.54, atol=0.01), ext
    pose0, pose5 = reader.get_pose(ids[0]), reader.get_pose(ids[-1])
    dist = np.linalg.norm(pose5[:3, 3] - pose0[:3, 3])
    assert 0.5 < dist < 50.0, dist
    pcd = reader.get_point_cloud(ids[0])
    assert pcd.shape[1] == 3 and (pcd[:, 2] > 0).all()


def test_oxts_pose_motion_direction():
    rows = np.zeros((2, 30))
    rows[:, 0] = [49.0, 49.00001]  # northward latitude increase
    rows[:, 1] = 8.43
    poses = oxts_to_pose(rows)
    delta = poses[1][:3, 3] - poses[0][:3, 3]
    assert delta[1] > 1.0 and abs(delta[0]) < 1e-6  # +y (north) motion


def test_example_maker(kitti_tree):
    shwc = (5, 32, 96, 3)
    keys = ["image", "intrinsic", "depth_gt", "pose_gt", "image_R",
            "intrinsic_R", "stereo_T_LR"]
    maker = ExampleMaker("kitti_raw", "train", shwc, keys, kitti_tree)
    maker.init_reader((DATE, DRIVE))
    idx = maker.get_range()[len(maker.get_range()) // 2]
    ex = maker.get_example(idx)

    assert ex["image"].shape == (5 * 32, 96, 3)
    assert ex["image"].dtype == np.uint8
    assert ex["image_R"].shape == (5 * 32, 96, 3)
    assert ex["intrinsic"].shape == (3, 3)
    # intrinsics rescaled to resized shape (raw 64x192 -> 32x96: /2)
    assert np.isclose(ex["intrinsic"][0, 0], 50.0)
    assert ex["pose_gt"].shape == (4, 4, 4)
    # target->source transforms have nonzero translation, near-identity rot
    trans = np.linalg.norm(ex["pose_gt"][:, :3, 3], axis=1)
    assert (trans > 0.1).all()
    assert ex["depth_gt"].shape == (32, 96, 1)
    assert (ex["depth_gt"] > 0).sum() > 50  # sparse but populated
    assert ex["stereo_T_LR"].shape == (4, 4)


def test_point_cloud_depth_roundtrip():
    k = np.array([[50, 0, 48], [0, 50, 16], [0, 0, 1]], np.float64)
    pts = np.array([[0.0, 0.0, 10.0], [0.96, 0.4, 20.0]])
    depth = point_cloud_to_depth_map(pts, k, (32, 96))
    assert depth.shape == (32, 96)
    # principal point lands at (48, 16) exactly with depth 10
    assert np.isclose(depth[16, 48], 10.0)
    # second point at (u=50.4, v=17.0): the (17, 50) neighbor holds weight
    # 0.6 >= 0.5 and survives the low-weight cutoff (tfr_util.py:184)
    assert np.isclose(depth[17, 50], 20.0)
    # a lone half-pixel point spreads weight < 0.5 to every neighbor and
    # is suppressed entirely -- reference behavior
    lone = point_cloud_to_depth_map(np.array([[1.0, 0.5, 20.0]]), k, (32, 96))
    assert lone.sum() == 0.0


def test_shard_roundtrip(kitti_tree, tmp_path):
    shwc = (5, 32, 96, 3)
    keys = ["image", "intrinsic", "depth_gt", "pose_gt", "stereo_T_LR"]
    maker = ExampleMaker("kitti_raw", "train", shwc, keys, kitti_tree)
    maker.init_reader((DATE, DRIVE))

    drive_dir = tmp_path / "drive0"
    examples = []
    with ShardWriter(drive_dir, frames_per_shard=3) as writer:
        for idx in maker.get_range():
            ex = maker.get_example(idx)
            writer.write(ex)
            examples.append(ex)
        writer.write_config({"dataset": "kitti_raw"})
    assert writer.count == len(examples) >= 4

    dest = tmp_path / "kitti_raw_train"
    merge_drive_dirs([drive_dir], dest)
    cfg = json.loads((dest / "shard_config.json").read_text())
    assert cfg["length"] == len(examples)

    ds = ShardDataset(dest)
    assert len(ds) == len(examples)
    back = ds.read_example(0)
    for key in examples[0]:
        assert np.array_equal(back[key], examples[0][key]), key

    loader = DatasetLoader(ds, batch_size=2, shuffle=True)
    batch = next(iter(loader))
    assert batch["image5d"].shape == (2, 5, 32, 96, 3)
    assert batch["image5d"].dtype == np.float32
    assert batch["image5d"].min() >= -1.0 and batch["image5d"].max() <= 1.0
    assert batch["intrinsic"].shape == (2, 3, 3)
    assert batch["depth_gt"].shape == (2, 32, 96, 1)
    assert loader.steps_per_epoch == len(examples) // 2


def test_schema_enforcement(tmp_path):
    with ShardWriter(tmp_path / "s", max_schema_errors=2) as w:
        w.write({"a": np.zeros((2, 2), np.float32)})
        w.write({"a": np.zeros((3, 3), np.float32)})  # mismatch 1
        w.write({"a": np.zeros((3, 3), np.float32)})  # mismatch 2
        with pytest.raises(Exception):
            w.write({"a": np.zeros((3, 3), np.float32)})  # strike out
    assert w.count == 1


def test_shard_maker_and_validation(kitti_tree, tmp_path):
    """Full conversion driver: drives -> atomic shard dir -> val split
    (create_tfrecords_main.py + validation_maker.py capability)."""
    from xpt_mde_tpu.config import Config
    from xpt_mde_tpu.data.shard_maker import (ShardMaker,
                                              generate_validation_shards)

    cfg = Config(datapath=str(tmp_path), validation_frames=3,
                 image_size_overrides={"kitti_raw": (32, 96)})

    maker = ShardMaker(cfg, "kitti_raw", "train", kitti_tree,
                       data_keys=["image", "intrinsic", "depth_gt",
                                  "pose_gt", "stereo_T_LR"],
                       drives=[(DATE, DRIVE)])
    out = maker.make()
    assert out.exists() and (out / "shard_config.json").exists()
    ds = ShardDataset(out)
    assert len(ds) >= 4

    # idempotent re-run skips
    assert maker.make() == out

    val_dir = generate_validation_shards(cfg, "kitti_raw")
    val_ds = ShardDataset(val_dir)
    assert len(val_ds) == 3
    ex = val_ds.read_example(0)
    assert ex["image"].shape == (5 * 32, 96, 3)


def test_native_loader_matches_numpy(kitti_tree, tmp_path):
    """C++ shard reader must produce byte-identical batches to the numpy
    path (same shuffle seed)."""
    from xpt_mde_tpu.config import Config
    from xpt_mde_tpu.data.native_loader import (NativeDatasetLoader,
                                                PrefetchLoader, make_loader)
    from xpt_mde_tpu.data.shard_maker import ShardMaker

    cfg = Config(datapath=str(tmp_path),
                 image_size_overrides={"kitti_raw": (32, 96)})
    out = ShardMaker(cfg, "kitti_raw", "train", kitti_tree,
                     data_keys=["image", "intrinsic", "depth_gt", "pose_gt"],
                     drives=[(DATE, DRIVE)]).make()

    np_loader = DatasetLoader(ShardDataset(out), batch_size=2, shuffle=True,
                              seed=3)
    nat_loader = NativeDatasetLoader(out, batch_size=2, shuffle=True, seed=3)
    for np_batch, nat_batch in zip(np_loader, nat_loader):
        assert set(np_batch.keys()) == set(nat_batch.keys())
        for key in np_batch:
            assert np.allclose(np_batch[key], nat_batch[key], atol=1e-6), key

    # prefetch wrapper yields the same stream
    pre = PrefetchLoader(NativeDatasetLoader(out, batch_size=2, shuffle=True,
                                             seed=3))
    n = sum(1 for _ in pre)
    assert n == np_loader.steps_per_epoch


def test_multi_process_input_sharding(kitti_tree, tmp_path):
    """Per-process disjoint batch slices (multi-host input pipeline)."""
    from xpt_mde_tpu.config import Config
    from xpt_mde_tpu.data.shard_maker import ShardMaker

    cfg = Config(datapath=str(tmp_path),
                 image_size_overrides={"kitti_raw": (32, 96)})
    out = ShardMaker(cfg, "kitti_raw", "train", kitti_tree,
                     data_keys=["image", "intrinsic"],
                     drives=[(DATE, DRIVE)]).make()
    ds = ShardDataset(out)
    l0 = DatasetLoader(ds, batch_size=2, shuffle=True, seed=7,
                       process_index=0, process_count=2)
    l1 = DatasetLoader(ShardDataset(out), batch_size=2, shuffle=True, seed=7,
                       process_index=1, process_count=2)
    b0 = next(iter(l0))
    b1 = next(iter(l1))
    # same epoch order, disjoint slices -> different examples
    assert not np.allclose(b0["image5d"], b1["image5d"])
    assert l0.steps_per_epoch == len(ds) // 4


def test_parallel_shard_build_matches_serial(kitti_tree, tmp_path):
    """Drives build over a spawn process pool (shard_build_workers);
    the output must be byte-identical to the serial build (per-drive
    dirs are independent, merge order is by drive index)."""
    from xpt_mde_tpu.config import Config
    from xpt_mde_tpu.data.shard_maker import ShardMaker

    outs = {}
    for mode, workers in (("serial", 0), ("pool", 2)):
        cfg = Config(datapath=str(tmp_path / mode),
                     image_size_overrides={"kitti_raw": (32, 96)},
                     shard_build_workers=workers)
        outs[mode] = ShardMaker(cfg, "kitti_raw", "train", kitti_tree,
                                data_keys=["image", "intrinsic"],
                                drives=[(DATE, DRIVE), (DATE, DRIVE)]).make()
    serial_files = sorted(p.name for p in outs["serial"].iterdir())
    pool_files = sorted(p.name for p in outs["pool"].iterdir())
    assert serial_files == pool_files and len(serial_files) > 1
    for name in serial_files:
        a = (outs["serial"] / name).read_bytes()
        b = (outs["pool"] / name).read_bytes()
        assert a == b, f"parallel build diverged in {name}"


def test_synthetic_shard_maker(tmp_path):
    """ShardMaker('synthetic', ...) builds real shards with zero raw
    data via SyntheticReader (the advertised smoke/demo path)."""
    from xpt_mde_tpu.config import Config
    from xpt_mde_tpu.data.shard_maker import ShardMaker

    cfg = Config(datapath=str(tmp_path),
                 image_size_overrides={"synthetic": (32, 96)})
    out = ShardMaker(cfg, "synthetic", "train", None).make()
    ds = ShardDataset(out)
    assert len(ds) > 0
    ex = ds.read_example(0)
    assert ex["image"].shape == (5 * 32, 96, 3)
    assert ex["pose_gt"].shape == (4, 4, 4)
    # exact plane GT survives the pipeline
    assert np.allclose(ex["depth_gt"][ex["depth_gt"] > 0], 10.0, atol=0.5)


def test_show_example_viewer(tmp_path):
    """Headless show_example builds image/image_R/depth panels, saves
    pngs, and apply_color_map blacks out invalid pixels
    (tfr_util.py:188-221)."""
    from xpt_mde_tpu.data.viewer import apply_color_map, show_example

    rng = np.random.RandomState(0)
    depth = np.zeros((16, 24), np.float32)
    depth[8:, :] = 25.0
    example = {
        "image": rng.randint(0, 255, (5 * 16, 24, 3), np.uint8),
        "image_R": rng.uniform(-1, 1, (5, 16, 24, 3)).astype(np.float32),
        "depth_gt": depth,
        "intrinsic": np.eye(3, dtype=np.float32),
        "pose_gt": np.tile(np.eye(4, dtype=np.float32), (4, 1, 1)),
    }
    panels = show_example(example, wait=-1, print_param=True,
                          save_dir=tmp_path)
    assert panels["image"].shape == (80, 24, 3)
    assert panels["image_R"].shape == (80, 24, 3)  # snippet stacked
    assert panels["depth"].shape == (16, 24, 3)
    # invalid (zero) depth pixels are black, valid ones colored
    assert (panels["depth"][:8] == 0).all()
    assert panels["depth"][8:].any()
    for name in ("image", "image_R", "depth"):
        assert (tmp_path / f"{name}.png").is_file()

    cm = apply_color_map(np.full((4, 4, 1), 50.0))
    assert cm.shape == (4, 4, 3) and cm.any()
