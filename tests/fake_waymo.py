"""Protocol-compatible fake of the waymo_open_dataset SDK surface that
WaymoReader touches, so its 20-frame buffer, Day filter, pose math and
point-cloud path run in CI without the real package
(/root/reference/tfrecords/readers/waymo_reader.py:58-138 behaviors).

A fake "segment" file is a pickled list of frame dicts; FakeFrame
deserializes one dict per record like dataset_pb2.Frame.ParseFromString.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from types import SimpleNamespace

import numpy as np


def make_frame_dict(index: int, time_of_day: str = "Day",
                    n_points: int = 64, seed: int = 0) -> dict:
    """One synthetic Waymo frame: forward motion of 0.5 m/frame, a small
    image, intrinsics, and a LiDAR return set with camera projections."""
    rng = np.random.RandomState(seed + index)
    pose_w_v = np.eye(4, dtype=np.float32)
    pose_w_v[0, 3] = 0.5 * index  # vehicle +x is forward
    image = rng.randint(0, 255, (8, 12, 3), dtype=np.uint8)
    # vehicle-frame points in front of the car (+x forward)
    points = np.stack([rng.uniform(2, 30, n_points),       # forward
                       rng.uniform(-5, 5, n_points),       # left
                       rng.uniform(-1, 2, n_points)], 1)   # up
    cam_names = rng.choice([1, 2], n_points)  # 1 = front camera
    return {"index": index, "time_of_day": time_of_day,
            "pose": pose_w_v, "image": image,
            "points": points.astype(np.float32), "cp_names": cam_names,
            "intrinsic": (400.0, 410.0, 6.0, 4.0)}


class FakeFrame:
    def ParseFromString(self, data: bytes) -> None:
        d = pickle.loads(bytes(data))
        self.context = SimpleNamespace(
            stats=SimpleNamespace(time_of_day=d["time_of_day"]),
            camera_calibrations=[SimpleNamespace(
                intrinsic=list(d["intrinsic"]))])
        self.images = [SimpleNamespace(
            pose=SimpleNamespace(transform=d["pose"].ravel().tolist()),
            image=d["image"])]
        self._points = d["points"]
        self._cp_names = d["cp_names"]


class _Record:
    def __init__(self, payload: bytes):
        self._payload = payload

    def numpy(self) -> bytes:
        return self._payload


class _FakeTFRecordDataset:
    def __init__(self, files, compression_type=""):
        self._records = []
        for f in files:
            self._records.extend(pickle.loads(Path(f).read_bytes()))

    def __iter__(self):
        return iter(_Record(pickle.dumps(d)) for d in self._records)


def _decode_jpeg(stored):
    return SimpleNamespace(numpy=lambda: stored)  # images stored raw


def _parse_range_image_and_camera_projection(frame):
    return None, None, None, None  # carried on the frame instead


def _convert_range_image_to_point_cloud(frame, ri, cp, top_pose):
    cp_points = np.zeros((len(frame._points), 6), np.int32)
    cp_points[:, 0] = frame._cp_names
    return [frame._points], [cp_points]


def fake_sdk():
    """(dataset_pb2, frame_utils, tf) triple for WaymoReader(sdk=...)."""
    dataset_pb2 = SimpleNamespace(Frame=FakeFrame)
    frame_utils = SimpleNamespace(
        parse_range_image_and_camera_projection=
        _parse_range_image_and_camera_projection,
        convert_range_image_to_point_cloud=
        _convert_range_image_to_point_cloud)
    tf = SimpleNamespace(
        data=SimpleNamespace(TFRecordDataset=_FakeTFRecordDataset),
        image=SimpleNamespace(decode_jpeg=_decode_jpeg))
    return dataset_pb2, frame_utils, tf


def write_segment(path: Path, frames: list) -> None:
    path.write_bytes(pickle.dumps(frames))
