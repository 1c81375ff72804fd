"""SDK-free Waymo segment parsing (waymo_native): TFRecord container
parity with real tensorflow, range-image -> point-cloud geometry against
hand-computed values (the math of the public SDK's range_image_utils),
and the WaymoReader end-to-end on true wire-format segment files.

Reference behaviors:
/root/reference/tfrecords/readers/waymo_reader.py:58-138.
"""

import numpy as np
import pytest

from xpt_mde_tpu.data.readers import waymo_native as wn
from xpt_mde_tpu.data.readers.waymo_protos import dataset_pb2 as pb


def test_crc32c_known_answer():
    # the standard CRC-32C check value
    assert wn.crc32c(b"123456789") == 0xE3069283
    assert wn.crc32c(b"") == 0


def test_tfrecord_container_roundtrip(tmp_path):
    records = [b"alpha", b"", b"\x00" * 100, np.arange(32, dtype=np.uint8).tobytes()]
    path = tmp_path / "t.tfrecord"
    wn.write_tfrecord_file(path, records)
    assert list(wn.read_tfrecord_file(path)) == records


def test_tfrecord_container_matches_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    records = [b"first", b"second" * 50]
    ours = tmp_path / "ours.tfrecord"
    theirs = tmp_path / "theirs.tfrecord"
    wn.write_tfrecord_file(ours, records)
    with tf.io.TFRecordWriter(str(theirs)) as writer:
        for r in records:
            writer.write(r)
    # byte-identical files both ways
    assert ours.read_bytes() == theirs.read_bytes()
    got = [r.numpy() for r in tf.data.TFRecordDataset(str(ours))]
    assert got == records
    assert list(wn.read_tfrecord_file(theirs)) == records


def test_tfrecord_crc_detects_corruption(tmp_path):
    path = tmp_path / "bad.tfrecord"
    wn.write_tfrecord_file(path, [b"payload"])
    raw = bytearray(path.read_bytes())
    raw[14] ^= 0xFF  # flip a payload byte
    path.write_bytes(bytes(raw))
    with pytest.raises(IOError, match="crc mismatch"):
        list(wn.read_tfrecord_file(path))


# ---------------------------------------------------------------------------
# range-image geometry
# ---------------------------------------------------------------------------


def _compress_matrix(array, proto_cls):
    import zlib

    matrix = proto_cls()
    matrix.data.extend(np.asarray(array).ravel().tolist())
    matrix.shape.dims.extend(array.shape)
    return zlib.compress(matrix.SerializeToString())


def _make_laser_frame(range_image, extrinsic=np.eye(4),
                      inclinations=(-0.3, 0.2), frame_pose=np.eye(4),
                      top_pose=None, camera_projection=None):
    frame = pb.Frame()
    frame.pose.transform.extend(np.asarray(frame_pose, np.float64).ravel())
    calib = frame.context.laser_calibrations.add()
    calib.name = pb.LaserName.TOP
    calib.beam_inclinations.extend(inclinations)
    calib.extrinsic.transform.extend(np.asarray(extrinsic, np.float64).ravel())
    laser = frame.lasers.add()
    laser.name = pb.LaserName.TOP
    ri4 = np.zeros(range_image.shape + (4,), np.float32)
    ri4[..., 0] = range_image
    laser.ri_return1.range_image_compressed = _compress_matrix(
        ri4, pb.MatrixFloat)
    if camera_projection is not None:
        laser.ri_return1.camera_projection_compressed = _compress_matrix(
            camera_projection.astype(np.int32), pb.MatrixInt32)
    if top_pose is not None:
        laser.ri_return1.range_image_pose_compressed = _compress_matrix(
            top_pose.astype(np.float32), pb.MatrixFloat)
    return frame


def _points_of(frame):
    parsed = wn.parse_range_image_and_camera_projection(frame)
    pts, cps = wn.convert_range_image_to_point_cloud(frame, parsed[0],
                                                     parsed[1], parsed[3])
    return np.concatenate(pts, 0), np.concatenate(cps, 0)


def test_polar_to_cartesian_hand_values():
    # H=2 x W=4; row 0 = top beam (inclination 0.2), azimuth of column 1
    # is ((4-0.5-1)/4*2-1)*pi = 0.25*pi; range 10
    ri = np.zeros((2, 4), np.float32)
    ri[0, 1] = 10.0
    pts, _ = _points_of(_make_laser_frame(ri))
    assert pts.shape == (1, 3)
    expected = np.array([np.cos(0.2) * np.cos(0.25 * np.pi) * 10,
                         np.cos(0.2) * np.sin(0.25 * np.pi) * 10,
                         np.sin(0.2) * 10])
    np.testing.assert_allclose(pts[0], expected, atol=1e-5)


def test_uniform_inclinations_match_explicit():
    ri = np.random.RandomState(0).uniform(1, 50, (4, 8)).astype(np.float32)
    explicit = _make_laser_frame(ri, inclinations=np.linspace(
        -0.3 + 0.075, 0.3 - 0.075, 4))  # centers of 4 uniform bins
    uniform = _make_laser_frame(ri, inclinations=())
    calib = uniform.context.laser_calibrations[0]
    calib.beam_inclination_min = -0.3
    calib.beam_inclination_max = 0.3
    np.testing.assert_allclose(_points_of(explicit)[0],
                               _points_of(uniform)[0], atol=1e-5)


def test_extrinsic_yaw_plus_translation_property():
    # extrinsic = [R_z(theta), t]: azimuth correction cancels the yaw, so
    # vehicle points equal the identity-extrinsic points shifted by t
    ri = np.random.RandomState(1).uniform(1, 50, (2, 8)).astype(np.float32)
    theta, t = 0.7, np.array([1.5, -2.0, 0.4])
    ext = np.eye(4)
    ext[:2, :2] = [[np.cos(theta), -np.sin(theta)],
                   [np.sin(theta), np.cos(theta)]]
    ext[:3, 3] = t
    base, _ = _points_of(_make_laser_frame(ri))
    moved, _ = _points_of(_make_laser_frame(ri, extrinsic=ext))
    np.testing.assert_allclose(moved, base + t, atol=1e-5)


def test_top_pose_equal_to_frame_pose_is_identity():
    # per-pixel pose == frame pose: world = T p, then inv(T) world = p
    ri = np.random.RandomState(2).uniform(1, 50, (2, 4)).astype(np.float32)
    yaw, trans = 0.3, np.array([5.0, -2.0, 1.0])
    pose = np.eye(4)
    pose[:2, :2] = [[np.cos(yaw), -np.sin(yaw)],
                    [np.sin(yaw), np.cos(yaw)]]
    pose[:3, 3] = trans
    top = np.zeros((2, 4, 6), np.float32)
    top[..., 2] = yaw
    top[..., 3:6] = trans
    base, _ = _points_of(_make_laser_frame(ri))
    compensated, _ = _points_of(
        _make_laser_frame(ri, frame_pose=pose, top_pose=top))
    np.testing.assert_allclose(compensated, base, atol=1e-4)


def test_rotation_zyx_composition():
    roll, pitch, yaw = 0.1, -0.2, 0.3
    c, s = np.cos, np.sin
    rx = np.array([[1, 0, 0], [0, c(roll), -s(roll)], [0, s(roll), c(roll)]])
    ry = np.array([[c(pitch), 0, s(pitch)], [0, 1, 0],
                   [-s(pitch), 0, c(pitch)]])
    rz = np.array([[c(yaw), -s(yaw), 0], [s(yaw), c(yaw), 0], [0, 0, 1]])
    np.testing.assert_allclose(wn._rotation_zyx(roll, pitch, yaw),
                               rz @ ry @ rx, atol=1e-12)


# ---------------------------------------------------------------------------
# WaymoReader end-to-end on wire-format segments
# ---------------------------------------------------------------------------


def _full_frame(index, time_of_day="Day"):
    import cv2

    rng = np.random.RandomState(index)
    yaw = 0.0
    frame = pb.Frame()
    frame.timestamp_micros = 1_000_000 * index
    frame.context.stats.time_of_day = time_of_day
    pose = np.eye(4)
    pose[0, 3] = 0.5 * index
    frame.pose.transform.extend(pose.ravel())

    cam = frame.context.camera_calibrations.add()
    cam.name = pb.CameraName.FRONT
    cam.intrinsic.extend([400.0, 410.0, 6.0, 4.0, 0, 0, 0, 0, 0])
    cam.width, cam.height = 12, 8

    img = frame.images.add()
    img.name = pb.CameraName.FRONT
    solid = np.full((8, 12, 3), (40, 90, 200), np.uint8)  # RGB
    ok, jpeg = cv2.imencode(".jpg", cv2.cvtColor(solid, cv2.COLOR_RGB2BGR))
    assert ok
    img.image = jpeg.tobytes()
    img.pose.transform.extend(pose.ravel())

    calib = frame.context.laser_calibrations.add()
    calib.name = pb.LaserName.TOP
    calib.beam_inclinations.extend(np.linspace(-0.3, 0.2, 4))
    calib.extrinsic.transform.extend(np.eye(4).ravel())
    laser = frame.lasers.add()
    laser.name = pb.LaserName.TOP
    ri = np.zeros((4, 16, 4), np.float32)
    ri[..., 0] = rng.uniform(2, 60, (4, 16))
    cp = np.zeros((4, 16, 6), np.int32)
    # forward-facing columns project into the FRONT camera (name 1)
    front_cols = slice(6, 10)
    cp[:, front_cols, 0] = 1
    laser.ri_return1.range_image_compressed = _compress_matrix(
        ri, pb.MatrixFloat)
    laser.ri_return1.camera_projection_compressed = _compress_matrix(
        cp, pb.MatrixInt32)
    return frame


@pytest.fixture()
def native_drive(tmp_path):
    from xpt_mde_tpu.data.readers.waymo_reader import WaymoReader

    drive = tmp_path / "training_0000"
    drive.mkdir()
    frames = [_full_frame(i) for i in range(8)]
    frames[5].context.stats.time_of_day = "Night"
    wn.write_tfrecord_file(drive / "segment-0.tfrecord",
                           [f.SerializeToString() for f in frames])
    reader = WaymoReader("train", tmp_path)  # no sdk arg: native parser
    reader.init_drive(drive)
    return reader


def test_reader_native_pose_and_filters(native_drive):
    from xpt_mde_tpu.data.readers.waymo_reader import T_C2V
    from xpt_mde_tpu.utils.util_class import RecoverableSkip

    pose = native_drive.get_pose(4)
    expected = np.eye(4, dtype=np.float32)
    expected[0, 3] = 2.0
    np.testing.assert_allclose(pose, expected @ T_C2V, atol=1e-6)
    with pytest.raises(RecoverableSkip, match="non-Day"):
        native_drive.get_pose(5)
    with pytest.raises(StopIteration):
        native_drive.get_pose(50)


def test_reader_native_image_and_intrinsic(native_drive):
    k = native_drive.get_intrinsic(2)
    np.testing.assert_allclose(k, [[400, 0, 6], [0, 410, 4], [0, 0, 1]])
    image = native_drive.get_image(2)  # reader returns BGR
    assert image.shape == (8, 12, 3)
    # solid RGB (40, 90, 200) -> BGR (200, 90, 40) within JPEG error
    np.testing.assert_allclose(image.reshape(-1, 3).mean(0), [200, 90, 40],
                               atol=6)


def test_reader_native_point_cloud_front_camera(native_drive):
    pts = native_drive.get_point_cloud(3)
    # 4 rows x 4 front-projecting columns, minus any behind the camera
    assert 0 < pts.shape[0] <= 16
    # camera frame: +z forward; front-camera columns face forward
    assert (pts[:, 2] > 0).all()
    # azimuth of columns 6..9 is within +-0.25pi of forward: |x| < z
    assert (np.abs(pts[:, 0]) < pts[:, 2] + 1e-5).all()
