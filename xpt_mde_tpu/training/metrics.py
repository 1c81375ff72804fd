"""On-device training metrics: depth AbsRel and snippet pose errors.

jnp port of the in-training metrics (/root/reference/model/train_val.py:
180-236) and of PoseMetric (/root/reference/evaluate/eval_utils.py:9-106)
so the train loop never syncs to host per step (the reference's per-step
``.numpy()`` sync is the throughput bug SURVEY.md flags).
"""

from __future__ import annotations

import jax.numpy as jnp

from xpt_mde_tpu.utils import se3


def snippet_pose_from_first(poses: jnp.ndarray) -> jnp.ndarray:
    """Insert the identity target pose at snippet index 2 and rebase all
    poses to the first frame (eval_utils.py:28-39).

    :param poses: [batch, numsrc, 4, 4]
    :return: [batch, numsrc+1, 4, 4]
    """
    batch = poses.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=poses.dtype), (batch, 1, 4, 4))
    poses_mat = jnp.concatenate([poses[:, :2], eye, poses[:, 2:]], axis=1)
    origin_inv = se3.invert_matrix(poses_mat[:, 0:1])
    return origin_inv @ poses_mat


def trajectory_error(pose_pred_mat, pose_true_mat, abs_scale: bool) -> jnp.ndarray:
    """Snippet trajectory error in meters [batch, snippet-1]
    (eval_utils.py:41-59)."""
    xyz_pred = pose_pred_mat[:, :, :3, 3]
    xyz_true = pose_true_mat[:, :, :3, 3]
    if abs_scale:
        err = xyz_true - xyz_pred
    else:
        denom = jnp.maximum(jnp.sum(xyz_pred ** 2, axis=2), 1e-12)
        scale = jnp.sum(xyz_true * xyz_pred, axis=2) / denom
        err = xyz_true - xyz_pred * scale[..., None]
    err = jnp.sqrt(jnp.sum(err ** 2, axis=2))
    return err[:, 1:]


def rotational_error(pose_pred_mat, pose_true_mat) -> jnp.ndarray:
    """Geodesic rotation error in rad [batch, snippet-1]
    (eval_utils.py:61-75)."""
    rot_pred = pose_pred_mat[:, :, :3, :3]
    rot_true = pose_true_mat[:, :, :3, :3]
    rel = jnp.swapaxes(rot_pred, -1, -2) @ rot_true
    trace = jnp.trace(rel, axis1=-2, axis2=-1)
    angle = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
    return angle[:, 1:]


def pose_metrics(pose_pred_twist: jnp.ndarray,
                 pose_true_mat: jnp.ndarray) -> dict:
    """Mean snippet trajectory/rotation errors (train_val.py:203-209)."""
    pred_mat = snippet_pose_from_first(se3.twist_to_matrix(pose_pred_twist))
    true_mat = snippet_pose_from_first(pose_true_mat)
    return {
        "trj_err": jnp.mean(trajectory_error(pred_mat, true_mat, True)),
        "trj_rel_err": jnp.mean(trajectory_error(pred_mat, true_mat, False)),
        "rot_err": jnp.mean(rotational_error(pred_mat, true_mat)),
    }


def depth_abs_rel(depth_pred: jnp.ndarray, depth_gt: jnp.ndarray,
                  min_depth: float = 1e-3, max_depth: float = 80.0) -> jnp.ndarray:
    """Per-batch AbsRel over valid GT pixels, with GT-median scaling
    (train_val.py:180-200). Sparse GT: zeros are invalid."""
    pred = jnp.squeeze(depth_pred, -1)
    gt = jnp.squeeze(depth_gt, -1)
    valid = jnp.logical_and(gt > min_depth, gt < max_depth)
    # median scaling per example via masked median approximation:
    # use mean ratio over valid pixels (cheap on device; exact median
    # scaling is applied in offline eval where parity matters)
    vf = valid.astype(pred.dtype)
    n = jnp.maximum(jnp.sum(vf, axis=(1, 2)), 1.0)
    scale = (jnp.sum(gt * vf, axis=(1, 2)) / n) / \
            jnp.maximum(jnp.sum(pred * vf, axis=(1, 2)) / n, 1e-6)
    pred = pred * scale[:, None, None]
    pred = jnp.clip(pred, min_depth, max_depth)
    rel = jnp.abs(gt - pred) / jnp.maximum(gt, min_depth)
    return jnp.sum(rel * vf, axis=(1, 2)) / n
