"""WaymoReader logic tests on a fake SDK (VERDICT r1 missing #3): the
20-frame streaming buffer, Day-frame filter, camera pose math
(T_w_v @ T_C2V) and the front-camera point-cloud path, matching
/root/reference/tfrecords/readers/waymo_reader.py:58-138 behaviors.
"""

import numpy as np
import pytest

from tests.fake_waymo import fake_sdk, make_frame_dict, write_segment
from xpt_mde_tpu.data.readers.waymo_reader import T_C2V, WaymoReader
from xpt_mde_tpu.utils.util_class import RecoverableSkip


@pytest.fixture()
def drive(tmp_path):
    drive_dir = tmp_path / "training_0000"
    drive_dir.mkdir()
    frames = [make_frame_dict(i) for i in range(30)]
    frames[5]["time_of_day"] = "Night"
    write_segment(drive_dir / "segment-0.tfrecord", frames)
    reader = WaymoReader("train", tmp_path, sdk=fake_sdk())
    reader.init_drive(drive_dir)
    return reader


def test_pose_is_camera_to_world(drive):
    pose = drive.get_pose(4)
    expected = np.eye(4, dtype=np.float32)
    expected[0, 3] = 2.0  # 0.5 m/frame forward
    assert np.allclose(pose, expected @ T_C2V)
    # camera z (front) maps to vehicle/world x (forward)
    assert np.allclose(pose[:3, 2], [1, 0, 0])


def test_day_filter_rejects_night_frame(drive):
    with pytest.raises(RecoverableSkip, match="non-Day"):
        drive.get_pose(5)
    assert drive.get_pose(6) is not None


def test_buffer_eviction_is_recoverable(drive):
    drive.get_pose(25)  # stream ahead; frames < 5 evicted (20-frame buffer)
    with pytest.raises(RecoverableSkip, match="evicted"):
        drive.get_pose(2)
    # still-buffered frames remain accessible out of order
    assert drive.get_pose(10) is not None


def test_end_of_drive_raises_stopiteration(drive):
    with pytest.raises(StopIteration):
        drive.get_pose(99)


def test_point_cloud_front_camera_in_camera_frame(drive):
    pts = drive.get_point_cloud(3)
    frame_dict = make_frame_dict(3)
    front = frame_dict["points"][frame_dict["cp_names"] == 1]
    assert pts.shape[0] == front.shape[0]
    # camera frame: z = vehicle x (forward), all samples are in front
    assert (pts[:, 2] > 0).all()
    assert np.allclose(np.sort(pts[:, 2]), np.sort(front[:, 0]), atol=1e-5)
    # camera x = -vehicle y (left -> right), camera y = -vehicle z
    assert np.allclose(np.sort(pts[:, 0]), np.sort(-front[:, 1]), atol=1e-5)


def test_intrinsic_and_image(drive):
    k = drive.get_intrinsic(2)
    assert np.allclose(k, [[400, 0, 6], [0, 410, 4], [0, 0, 1]])
    image = drive.get_image(2)
    assert image.shape == (8, 12, 3)
