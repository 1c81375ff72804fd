"""Fixture tests for the non-KITTI-raw dataset readers.

Each reader gets a miniature synthetic dataset in the exact on-disk
layout of the real one (zip members, calib text, camera json, lidar
npz), then the full DataReaderBase surface is exercised: drive listing,
frame ranges, images (left/right), intrinsics, stereo extrinsics,
poses, and depth/point-cloud reconstruction. Behavioral contracts cite
/root/reference/tfrecords/readers/*.py in the reader docstrings.
"""

from __future__ import annotations

import io
import json
import zipfile
from pathlib import Path

import cv2
import numpy as np
import pytest


def _png_bytes(img: np.ndarray) -> bytes:
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return buf.tobytes()


def _jpg_bytes(img: np.ndarray) -> bytes:
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


# --------------------------------------------------------------------------
# KITTI odometry


@pytest.fixture(scope="module")
def odom_tree(tmp_path_factory):
    base = tmp_path_factory.mktemp("kitti_odom")
    seq = base / "sequences" / "09"
    (seq / "image_2").mkdir(parents=True)
    (seq / "image_3").mkdir(parents=True)
    rng = np.random.RandomState(0)
    n = 8
    for i in range(n):
        cv2.imwrite(str(seq / "image_2" / f"{i:06d}.png"),
                    rng.randint(0, 255, (16, 32, 3), np.uint8))
        cv2.imwrite(str(seq / "image_3" / f"{i:06d}.png"),
                    rng.randint(0, 255, (16, 32, 3), np.uint8))
    fx, fy, cx, cy = 100.0, 110.0, 16.0, 8.0
    t2, t3 = 0.06, -0.48
    p2 = [fx, 0, cx, fx * t2, 0, fy, cy, 0, 0, 0, 1, 0]
    p3 = [fx, 0, cx, fx * t3, 0, fy, cy, 0, 0, 0, 1, 0]
    (seq / "calib.txt").write_text(
        "P0: " + " ".join(map(str, p2)) + "\n"
        "P1: " + " ".join(map(str, p3)) + "\n"
        "P2: " + " ".join(map(str, p2)) + "\n"
        "P3: " + " ".join(map(str, p3)) + "\n")
    # test-split GT poses: translate along z per frame
    (base / "poses").mkdir()
    rows = []
    for i in range(n):
        m = np.eye(4)[:3]
        m[2, 3] = float(i)
        rows.append(" ".join(f"{v:.6e}" for v in m.reshape(-1)))
    (base / "poses" / "09.txt").write_text("\n".join(rows) + "\n")
    return base


def test_kitti_odom_reader_test_split(odom_tree):
    from xpt_mde_tpu.data.readers.kitti_reader import KittiOdomReader

    reader = KittiOdomReader("test", odom_tree)
    assert reader.list_drive_paths() == ["09", "10"]
    reader.init_drive("09")
    assert reader.num_frames_() == 8
    assert list(reader.get_range_()) == list(range(8))

    img = reader.get_image(3)
    assert img.shape == (16, 32, 3) and img.dtype == np.uint8
    assert reader.get_image(3, right=True).shape == (16, 32, 3)

    k = reader.get_intrinsic()
    np.testing.assert_allclose(k, [[100, 0, 16], [0, 110, 8], [0, 0, 1]])

    # odometry stereo extrinsic from projection offsets: x = t2 - t3
    t_lr = reader.get_stereo_extrinsic()
    np.testing.assert_allclose(t_lr[0, 3], 0.06 - (-0.48), atol=1e-6)

    pose = reader.get_pose(5)
    np.testing.assert_allclose(pose[2, 3], 5.0)
    # right pose = T_w_cam2 @ T_LR (reference kitti_reader.py:321-328)
    np.testing.assert_allclose(reader.get_pose(5, right=True),
                               pose @ t_lr.astype(np.float32), atol=1e-5)
    assert reader.get_point_cloud(5) is None


def test_kitti_odom_reader_train_split_trims_ends(odom_tree):
    from xpt_mde_tpu.data.readers.kitti_reader import KittiOdomReader

    reader = KittiOdomReader("train", odom_tree)
    assert "09" not in reader.list_drive_paths()  # test seqs excluded
    assert "12" not in reader.list_drive_paths()  # known-bad seq dropped
    reader.init_drive("09")
    assert list(reader.get_range_()) == [2, 3, 4, 5]  # 2 first/last dropped
    assert reader.get_pose(3) is None  # no GT poses for train


# --------------------------------------------------------------------------
# Cityscapes


@pytest.fixture(scope="module")
def city_zips(tmp_path_factory):
    base = tmp_path_factory.mktemp("cityscapes")
    rng = np.random.RandomState(1)
    n = 10
    h, w = 16, 64  # CITY_CROP clips to [0:750, 48:2048] -> [16, 16]
    left = zipfile.ZipFile(base / "leftImg8bit_sequence_trainvaltest.zip", "w")
    right = zipfile.ZipFile(base / "rightImg8bit_sequence_trainvaltest.zip",
                            "w")
    cam = zipfile.ZipFile(base / "camera_trainvaltest.zip", "w")
    disp = zipfile.ZipFile(base / "disparity_trainvaltest.zip", "w")
    for i in range(n):
        stem = f"aachen_000000_{i:06d}"
        left.writestr(f"leftImg8bit_sequence/train/aachen/"
                      f"{stem}_leftImg8bit.png",
                      _png_bytes(rng.randint(0, 255, (h, w, 3), np.uint8)))
        right.writestr(f"rightImg8bit_sequence/train/aachen/"
                       f"{stem}_rightImg8bit.png",
                       _png_bytes(rng.randint(0, 255, (h, w, 3), np.uint8)))
        # raw uint16 disparity: value 257 -> disp (257-1)/256 = 1.0 px
        dmap = np.zeros((h, w), np.uint16)
        dmap[:, w // 2:] = 257
        disp.writestr(f"disparity_sequence/train/aachen/"
                      f"{stem}_disparity.png", _png_bytes(dmap))
    cam.writestr("camera/train/aachen/aachen_000000_camera.json",
                 json.dumps({"intrinsic": {"fx": 90.0, "fy": 95.0,
                                           "u0": 60.0, "v0": 7.0},
                             "extrinsic": {"baseline": 0.22}}))
    for z in (left, right, cam, disp):
        z.close()
    return base


def test_cityscapes_reader(city_zips):
    from xpt_mde_tpu.data.readers.city_reader import (CITY_CROP,
                                                      CityscapesReader)

    reader = CityscapesReader("train", city_zips)
    drives = reader.list_drive_paths()
    assert drives == ["leftImg8bit_sequence/train/aachen/aachen"]
    reader.init_drive(drives[0])
    # 10 frames, 4 first/last dropped per sub-drive
    assert list(reader.get_range_()) == [4, 5]

    img = reader.get_image(4)
    assert img.shape == (16, 16, 3)  # CITY_CROP applied
    assert reader.get_image(4, right=True).shape == (16, 16, 3)

    k = reader.get_intrinsic(4)
    np.testing.assert_allclose(
        k, [[90, 0, 60 - CITY_CROP[2]], [0, 95, 7 - CITY_CROP[0]],
            [0, 0, 1]])

    t_lr = reader.get_stereo_extrinsic(4)
    np.testing.assert_allclose(t_lr[0, 3], 0.22)
    assert reader.get_pose(4) is None

    # disparity (raw 257 -> 1 px) -> depth fx*baseline/1
    pcd = reader.get_point_cloud(4)
    assert pcd is not None and pcd.shape[1] == 3
    np.testing.assert_allclose(pcd[:, 2], 90.0 * 0.22, rtol=1e-5)


# --------------------------------------------------------------------------
# A2D2


@pytest.fixture(scope="module")
def a2d2_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("a2d2")
    rng = np.random.RandomState(2)
    h, w = 16, 32
    cam_mat = [[50.0, 0.0, 16.0], [0.0, 55.0, 8.0], [0.0, 0.0, 1.0]]
    cfg = {"cameras": {}}
    for cam, ox in [("front_left", 0.0), ("front_right", 0.3)]:
        cfg["cameras"][cam] = {
            "CamMatrix": cam_mat, "CamMatrixOriginal": cam_mat,
            "Distortion": [0.0, 0.0, 0.0, 0.0], "Lens": "Telecam",
            "Resolution": [w, h],
            "view": {"x-axis": [1.0, 0.0, 0.0], "y-axis": [0.0, 1.0, 0.0],
                     "origin": [ox, 0.0, 0.0]},
        }
    (base / "cams_lidars.json").write_text(json.dumps(cfg))

    zips = {key: zipfile.ZipFile(base / f"20180807_145028_{key}.zip", "w")
            for key in ("camera_frontleft", "camera_frontright",
                        "lidar_frontleft", "lidar_frontright")}
    n = 5
    for i in range(n):
        for side, cam in [("frontleft", "front_left"),
                          ("frontright", "front_right")]:
            name = (f"camera/cam_{cam}/20180807145028_camera_{side}_"
                    f"{i:09d}.png")
            zips[f"camera_{side}"].writestr(
                name, _png_bytes(rng.randint(0, 255, (h, w, 3), np.uint8)))
            buf = io.BytesIO()
            np.savez(buf, **{"pcloud_attr.row": np.array([4.2, 9.8]),
                             "pcloud_attr.col": np.array([3.1, 20.6]),
                             "pcloud_attr.depth": np.array([7.5, 30.0])})
            zips[f"lidar_{side}"].writestr(
                name.replace("_camera_", "_lidar_")
                    .replace("/camera/", "/lidar/")
                    .replace(".png", ".npz"), buf.getvalue())
    for z in zips.values():
        z.close()
    return base


def test_a2d2_reader(a2d2_dir):
    from xpt_mde_tpu.data.readers.a2d2_reader import A2D2Reader

    reader = A2D2Reader("train", a2d2_dir)
    drives = reader.list_drive_paths()
    assert len(drives) == 1 and "camera_frontleft" in str(drives[0])
    reader.init_drive(drives[0])
    assert reader.num_frames_() == 5
    assert list(reader.get_range_()) == [2]

    assert reader.get_image(2).shape == (16, 32, 3)
    assert reader.get_image(2, right=True).shape == (16, 32, 3)
    np.testing.assert_allclose(reader.get_intrinsic(2)[0, 0], 50.0)

    # identity view axes -> stereo extrinsic is the origin offset
    t_lr = reader.get_stereo_extrinsic(2)
    np.testing.assert_allclose(t_lr[:3, 3], [0.3, 0.0, 0.0], atol=1e-7)

    # lidar npz row/col/depth splat into the depth map -> point cloud
    pcd = reader.get_point_cloud(2)
    assert pcd.shape[1] == 3
    np.testing.assert_allclose(sorted(pcd[:, 2]), [7.5, 30.0])
    assert reader.get_pose(2) is None


def test_a2d2_telecam_undistort_identity(a2d2_dir):
    """Zero distortion + identical camera matrices = passthrough."""
    from xpt_mde_tpu.data.readers.a2d2_reader import SensorConfig

    cfg = SensorConfig.from_file(a2d2_dir / "cams_lidars.json")
    img = np.random.RandomState(3).randint(0, 255, (16, 32, 3), np.uint8)
    out = cfg.undistort_image(img, "front_left")
    assert out.shape == img.shape
    assert np.mean(np.abs(out.astype(int) - img.astype(int))) < 1.0


# --------------------------------------------------------------------------
# DrivingStereo


@pytest.fixture(scope="module")
def driving_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("driving")
    rng = np.random.RandomState(4)
    (base / "train-left-image").mkdir()
    (base / "train-right-image").mkdir()
    (base / "train-depth-map").mkdir()
    (base / "calib" / "half-image-calib").mkdir(parents=True)
    h, w = 16, 32
    left = zipfile.ZipFile(base / "train-left-image" / "drive1.zip", "w")
    right = zipfile.ZipFile(base / "train-right-image" / "drive1.zip", "w")
    depth = zipfile.ZipFile(base / "train-depth-map" / "drive1.zip", "w")
    for i in range(6):
        name = f"2018-07-16/{i:06d}.jpg"
        left.writestr(name,
                      _jpg_bytes(rng.randint(0, 255, (h, w, 3), np.uint8)))
        right.writestr(name,
                       _jpg_bytes(rng.randint(0, 255, (h, w, 3), np.uint8)))
        dmap = np.full((h, w), 256 * 12, np.uint16)  # 12 m everywhere
        depth.writestr(name.replace(".jpg", ".png"), _png_bytes(dmap))
    for z in (left, right, depth):
        z.close()
    fx, fy, cx, cy = 80.0, 85.0, 16.0, 8.0
    p = f"{fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0"
    (base / "calib" / "half-image-calib" / "drive1.txt").write_text(
        f"P_rect_101: {p}\n"
        f"P_rect_103: {p}\n"
        "R_103: 1 0 0 0 1 0 0 0 1\n"
        "T_103: -0.54 0 0\n")
    return base


def test_driving_stereo_reader(driving_dir):
    from xpt_mde_tpu.data.readers.driving_reader import DrivingStereoReader

    reader = DrivingStereoReader("train", driving_dir)
    drives = reader.list_drive_paths()
    assert len(drives) == 1
    reader.init_drive(drives[0])
    assert reader.num_frames_() == 2  # 6 frames - 4
    assert list(reader.get_range_()) == [2, 3]

    assert reader.get_image(2).shape == (16, 32, 3)
    assert reader.get_image(2, right=True).shape == (16, 32, 3)
    np.testing.assert_allclose(
        reader.get_intrinsic(2), [[80, 0, 16], [0, 85, 8], [0, 0, 1]])

    # stereo extrinsic = inv(R_103|T_103): left-from-right inverted
    t_lr = reader.get_stereo_extrinsic(2)
    np.testing.assert_allclose(t_lr[0, 3], 0.54, atol=1e-6)

    # uint16/256 depth -> point cloud at 12 m
    pcd = reader.get_point_cloud(2)
    np.testing.assert_allclose(pcd[:, 2], 12.0, rtol=1e-6)
    assert reader.get_point_cloud(2, right=True) is None
    assert reader.get_pose(2) is None


# --------------------------------------------------------------------------
# ExampleMaker + ShardMaker through the zip-backed readers


@pytest.fixture(scope="module")
def city_zips_big(tmp_path_factory):
    """12-frame cityscapes fixture at a realistic aspect for the
    example-maker resize/crop chain."""
    base = tmp_path_factory.mktemp("cityscapes_big")
    rng = np.random.RandomState(5)
    h, w = 128, 512  # CITY_CROP -> 128 x 464
    left = zipfile.ZipFile(base / "leftImg8bit_sequence_trainvaltest.zip", "w")
    right = zipfile.ZipFile(base / "rightImg8bit_sequence_trainvaltest.zip",
                            "w")
    cam = zipfile.ZipFile(base / "camera_trainvaltest.zip", "w")
    disp = zipfile.ZipFile(base / "disparity_trainvaltest.zip", "w")
    for i in range(14):
        stem = f"aachen_000000_{i:06d}"
        left.writestr(f"leftImg8bit_sequence/train/aachen/"
                      f"{stem}_leftImg8bit.png",
                      _png_bytes(rng.randint(0, 255, (h, w, 3), np.uint8)))
        right.writestr(f"rightImg8bit_sequence/train/aachen/"
                       f"{stem}_rightImg8bit.png",
                       _png_bytes(rng.randint(0, 255, (h, w, 3), np.uint8)))
        dmap = np.zeros((h, w), np.uint16)
        dmap[::3, ::3] = 257  # sparse 1-px disparities
        disp.writestr(f"disparity_sequence/train/aachen/"
                      f"{stem}_disparity.png", _png_bytes(dmap))
    cam.writestr("camera/train/aachen/aachen_000000_camera.json",
                 json.dumps({"intrinsic": {"fx": 400.0, "fy": 410.0,
                                           "u0": 256.0, "v0": 64.0},
                             "extrinsic": {"baseline": 0.22}}))
    for z in (left, right, cam, disp):
        z.close()
    return base


def test_cityscapes_example_maker_stride2(city_zips_big):
    """Snippets use stride-2 frame ids for cityscapes
    (example_maker.py:97-99) and the aspect-preserving resize + bottom
    crop chain produces the target shape with rescaled intrinsics."""
    from xpt_mde_tpu.data.example_maker import ExampleMaker

    shwc = (5, 32, 96, 3)
    keys = ["image", "intrinsic", "image_R", "intrinsic_R", "depth_gt",
            "stereo_T_LR"]
    maker = ExampleMaker("cityscapes", "train", shwc, keys, city_zips_big)
    drive = "leftImg8bit_sequence/train/aachen/aachen"
    maker.init_reader(drive)
    rng_ids = list(maker.get_range())
    assert rng_ids == [4, 5, 6, 7, 8, 9]

    target = 5
    frame_id, seq = maker.make_snippet_ids(target)
    assert seq == [1, 3, 5, 7, 9]  # stride 2 around the target
    # drive-tail snippets clip to max(get_range()) and repeat the last
    # frame -- reference parity (example_maker.py:102)
    _, tail = maker.make_snippet_ids(9)
    assert tail == [5, 7, 9, 9, 9]

    ex = maker.get_example(target)
    assert ex["image"].shape == (5 * 32, 96, 3)
    assert ex["image_R"].shape == (5 * 32, 96, 3)
    # crop 128x464 -> resize (32, 116) -> center-crop width to 96
    np.testing.assert_allclose(ex["intrinsic"][0, 0], 400.0 * 116 / 464,
                               rtol=1e-3)
    np.testing.assert_allclose(ex["intrinsic"][1, 1], 410.0 * 32 / 128,
                               rtol=1e-3)
    # disparity-derived depth: fx_raw * baseline / 1 px
    depth = ex["depth_gt"]
    assert depth.shape == (32, 96, 1)
    positive = depth[depth > 0]
    assert positive.size > 0
    np.testing.assert_allclose(positive, 400.0 * 0.22, rtol=1e-4)
    np.testing.assert_allclose(ex["stereo_T_LR"][0, 3], 0.22)


def test_cityscapes_shard_maker(city_zips_big, tmp_path):
    """Full conversion driver over the zip-backed reader."""
    from xpt_mde_tpu.config import Config
    from xpt_mde_tpu.data.shard_io import ShardDataset
    from xpt_mde_tpu.data.shard_maker import ShardMaker

    cfg = Config(datapath=str(tmp_path),
                 image_size_overrides={"cityscapes": (32, 96)})
    out = ShardMaker(cfg, "cityscapes", "train", city_zips_big,
                     data_keys=["image", "intrinsic", "stereo_T_LR"],
                     drives=["leftImg8bit_sequence/train/aachen/aachen"]
                     ).make()
    ds = ShardDataset(out)
    assert len(ds) == 6
    ex = ds.read_example(0)
    assert ex["image"].shape == (5 * 32, 96, 3)


@pytest.fixture(scope="module")
def a2d2_dir_big(tmp_path_factory):
    """12-frame a2d2 fixture (stride-2 snippets need ids up to t+4)."""
    base = tmp_path_factory.mktemp("a2d2_big")
    rng = np.random.RandomState(6)
    h, w = 32, 96
    cam_mat = [[60.0, 0.0, 48.0], [0.0, 65.0, 16.0], [0.0, 0.0, 1.0]]
    cfg = {"cameras": {}}
    for cam, ox in [("front_left", 0.0), ("front_right", 0.3)]:
        cfg["cameras"][cam] = {
            "CamMatrix": cam_mat, "CamMatrixOriginal": cam_mat,
            "Distortion": [0.0, 0.0, 0.0, 0.0], "Lens": "Telecam",
            "Resolution": [w, h],
            "view": {"x-axis": [1.0, 0.0, 0.0], "y-axis": [0.0, 1.0, 0.0],
                     "origin": [ox, 0.0, 0.0]},
        }
    (base / "cams_lidars.json").write_text(json.dumps(cfg))
    zips = {key: zipfile.ZipFile(base / f"20180807_145028_{key}.zip", "w")
            for key in ("camera_frontleft", "camera_frontright",
                        "lidar_frontleft", "lidar_frontright")}
    for i in range(12):
        for side, cam in [("frontleft", "front_left"),
                          ("frontright", "front_right")]:
            name = (f"camera/cam_{cam}/20180807145028_camera_{side}_"
                    f"{i:09d}.png")
            zips[f"camera_{side}"].writestr(
                name, _png_bytes(rng.randint(0, 255, (h, w, 3), np.uint8)))
            buf = io.BytesIO()
            rows = np.arange(4, 28, 2.0)
            np.savez(buf, **{"pcloud_attr.row": rows,
                             "pcloud_attr.col": rows * 3,
                             "pcloud_attr.depth": np.full(len(rows), 9.0)})
            zips[f"lidar_{side}"].writestr(
                name.replace("_camera_", "_lidar_")
                    .replace("/camera/", "/lidar/")
                    .replace(".png", ".npz"), buf.getvalue())
    for z in zips.values():
        z.close()
    return base


def test_a2d2_example_maker_stride2(a2d2_dir_big):
    from xpt_mde_tpu.data.example_maker import ExampleMaker
    from xpt_mde_tpu.data.readers.a2d2_reader import A2D2Reader

    shwc = (5, 32, 96, 3)
    keys = ["image", "intrinsic", "image_R", "intrinsic_R", "depth_gt",
            "stereo_T_LR"]
    maker = ExampleMaker("a2d2", "train", shwc, keys, a2d2_dir_big)
    drive = A2D2Reader("train", a2d2_dir_big).list_drive_paths()[0]
    maker.init_reader(drive)

    target = 5
    frame_id, seq = maker.make_snippet_ids(target)
    assert seq == [1, 3, 5, 7, 9]  # stride 2 for a2d2

    ex = maker.get_example(target)
    assert ex["image"].shape == (5 * 32, 96, 3)
    assert ex["image_R"].shape == (5 * 32, 96, 3)
    assert ex["intrinsic"].shape == (3, 3)
    # lidar splat depths survive the resize/crop
    depth = ex["depth_gt"]
    assert depth.shape == (32, 96, 1)
    positive = depth[depth > 0]
    assert positive.size > 0
    np.testing.assert_allclose(positive, 9.0, rtol=1e-4)
    np.testing.assert_allclose(ex["stereo_T_LR"][:3, 3], [0.3, 0, 0],
                               atol=1e-6)
