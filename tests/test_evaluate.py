"""Evaluation metric tests.

Ports the reference's metric property tests (eval_utils.py:159-221):
doubled noise => doubled trajectory error; scale-only change => zero
relative error; rotation-magnitude recovery. Plus golden checks for the
Garg crop + median scaling path.
"""

import numpy as np

from xpt_mde_tpu.evaluate import (PoseMetric, compute_depth_metrics,
                                  valid_depth_filter)
from xpt_mde_tpu.utils import se3


def test_trajectory_error_scales_with_noise():
    rng = np.random.RandomState(0)
    pose_vec1 = rng.rand(8, 4, 6) * 2.0 - 1.0
    pose_vec2 = pose_vec1.copy()
    pose_vec2[:, 1:, :] += np.array([0, 1, 0, 0, 0, 0])
    pose_vec3 = pose_vec1.copy()
    pose_vec3[:, 1:, :] += np.array([0, 2, 0, 0, 0, 0])
    pose_vec4 = pose_vec1.copy()
    pose_vec4[:, :, :3] *= 2.0

    mat2 = se3.twist_to_matrix_np(pose_vec2.astype(np.float32))
    mat3 = se3.twist_to_matrix_np(pose_vec3.astype(np.float32))
    mat4 = se3.twist_to_matrix_np(pose_vec4.astype(np.float32))

    e12 = PoseMetric().compute_pose_errors(pose_vec1, mat2)
    e13 = PoseMetric().compute_pose_errors(pose_vec1, mat3)
    e14 = PoseMetric().compute_pose_errors(pose_vec1, mat4)

    assert np.allclose(e12.trj_abs_err * 2.0, e13.trj_abs_err, atol=1e-4)
    assert np.allclose(e14.trj_rel_err, 0, atol=1e-4)


def test_rotation_error_magnitude():
    rng = np.random.RandomState(1)
    pose_vec1 = rng.rand(8, 4, 6) * 2.0 - 1.0
    pose_vec1[:, 1:, 3:] = pose_vec1[:, 0:1, 3:]
    norms = np.linalg.norm(pose_vec1[:, 0:1, 3:], axis=2, keepdims=True)
    pose_vec1[:, :, 3:] /= norms
    pose_vec2 = pose_vec1.copy()
    pose_vec2[:, 1, 3:] *= 0.5
    pose_vec2[:, 3, 3:] *= 1.5
    mat2 = se3.twist_to_matrix_np(pose_vec2.astype(np.float32))
    e12 = PoseMetric().compute_pose_errors(pose_vec1, mat2)
    assert np.allclose(e12.rot_err[:, 0], 0.5, atol=1e-3)
    assert np.allclose(e12.rot_err[:, 1], 0.0, atol=1e-3)
    assert np.allclose(e12.rot_err[:, 2], 0.0, atol=1e-3)
    assert np.allclose(e12.rot_err[:, 3], 0.5, atol=1e-3)


def test_depth_metrics_perfect_prediction():
    gt = np.random.RandomState(2).uniform(1, 60, (1000,))
    m = compute_depth_metrics(gt.copy(), gt)
    assert np.allclose(m[:4], 0.0)
    assert np.allclose(m[4:], 1.0)


def test_depth_metrics_known_values():
    gt = np.full((100,), 10.0)
    pred = np.full((100,), 12.0)
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = compute_depth_metrics(pred, gt)
    assert np.isclose(abs_rel, 0.2)
    assert np.isclose(sq_rel, 0.4)
    assert np.isclose(rmse, 2.0)
    assert np.isclose(rmse_log, np.log(1.2))
    assert a1 == 1.0 and a2 == 1.0 and a3 == 1.0


def test_valid_depth_filter_crop_and_scaling():
    h, w = 100, 200
    gt = np.zeros((h, w))
    # valid GT pixels only inside the Garg crop (rows 40..99, cols 7..192)
    gt[50:90, 50:150] = 10.0
    pred = np.full((h, w, 1), 5.0)  # half scale -> median scaler = 2
    p, g = valid_depth_filter(pred, gt)
    assert p.shape == g.shape and p.size == 40 * 100
    assert np.allclose(p, 10.0)  # rescaled by GT/pred median ratio
    assert np.allclose(g, 10.0)
    m = compute_depth_metrics(p, g)
    assert np.allclose(m[0], 0.0)


def test_valid_depth_filter_excludes_out_of_range():
    h, w = 100, 200
    gt = np.zeros((h, w))
    gt[50:90, 50:150] = 10.0
    gt[60, 60] = 100.0  # beyond max depth -> excluded
    gt[61, 61] = 1e-4   # below min depth -> excluded
    pred = np.full((h, w), 10.0)
    p, g = valid_depth_filter(pred, gt)
    assert p.size == 40 * 100 - 2
