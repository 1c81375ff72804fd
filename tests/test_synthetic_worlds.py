"""Geometric contracts of the round-4 synthetic worlds (VERDICT r3 #2/#4).

The learning proofs are only as good as the renderers' GT, so these
tests pin the geometry analytically:

- moving-object world: GT depth+pose rigid synthesis reproduces the
  target EXCEPT in the moving band, and the classic moving-object
  depth bias d_obj/(1-r) makes the band photometrically consistent --
  the precise failure mode the reference's CombinedLoss exists for
  (losses.py:235-279);
- planar 3-D world: GT synthesis closes under camera yaw (all 6 twist
  DoF live), depth profile spans [depth_min, depth_max] top-to-bottom.
"""

import jax.numpy as jnp
import numpy as np

from xpt_mde_tpu.data import PlanarSceneDataset, SyntheticDataset
from xpt_mde_tpu.ops import synthesize_multi_scale
from xpt_mde_tpu.utils import se3


def _gt_synth_err(feats, depth_override=None):
    """Per-pixel photometric error of GT-driven rigid synthesis,
    averaged over sources: [H, W] for batch item 0."""
    image5d = jnp.asarray(feats["image5d"])
    sources, target = image5d[:, :-1], image5d[:, -1]
    depth = jnp.asarray(depth_override if depth_override is not None
                        else feats["depth_gt"])
    synth = synthesize_multi_scale(
        sources, jnp.asarray(feats["intrinsic"]), [depth],
        jnp.asarray(feats["pose_gt"]))[0]
    err = jnp.abs(synth - target[:, None])
    # ignore flowed-out zeros (validity mask): err only where synth != 0
    valid = (jnp.abs(synth).sum(-1, keepdims=True) > 1e-6)
    err = jnp.where(valid, err, 0.0)
    per_pix = np.asarray(jnp.sum(err, axis=(1, 4))
                         / jnp.maximum(jnp.sum(valid, axis=(1, 4)), 1))
    return per_pix[0]


def test_moving_object_breaks_rigid_consistency_only_in_band():
    data = SyntheticDataset(batch_size=1, height=32, width=64,
                            num_batches=1, varying_depth=True,
                            moving_object=True, seed=3)
    feats = next(iter(data))
    r0, r1 = data.object_rows()
    err = _gt_synth_err(feats)
    margin = 8  # columns that flow out of view at max shift
    band = err[r0:r1, margin:-margin].mean()
    rest = np.concatenate([err[: r0 - 1, margin:-margin],
                           err[r1 + 1:, margin:-margin]]).mean()
    assert rest < 0.02, rest  # static rows: GT closes the warp
    assert band > 5 * rest, (band, rest)  # moving band: it cannot

    # GT depth in the band is the object's, not the background's
    depth = feats["depth_gt"][0, :, 0, 0]
    assert np.all(depth[r0:r1] == data.object_depth_m)

    # the wrong-but-consistent depth d_obj/(1-r): substituting it makes
    # the band photometrically consistent again (the bias rigid-only
    # training converges to; cmb's whole job is refusing this trade)
    biased = np.array(feats["depth_gt"])
    biased[0, r0:r1] = data.object_depth_m / (1 - data.object_vel_ratio)
    err_biased = _gt_synth_err(feats, biased)
    band_biased = err_biased[r0:r1, margin:-margin].mean()
    assert band_biased < 0.3 * band, (band_biased, band)


def test_accelerating_band_has_no_consistent_depth():
    """The v6 world property (measured r5 motivation: at constant
    velocity the trap state's photometric error is ~0.01 — BELOW any
    achievable flow error, so no mask criterion can evict an entered
    trap). With object_accel, the per-source equivalent velocity ratio
    varies across the snippet, so NO single band depth closes all
    sources: sweeping candidate depths from 0.5x to 6x GT, the best
    band error stays a large fraction of the GT-depth band error —
    the trap floor a learned flow CAN undercut."""
    data = SyntheticDataset(batch_size=1, height=32, width=64,
                            num_batches=1, varying_depth=True,
                            moving_object=True, object_accel=0.4, seed=3)
    feats = next(iter(data))
    r0, r1 = data.object_rows()
    margin = 8
    d_obj = data.object_depth_m

    def band_err(scale):
        depth = np.array(feats["depth_gt"])
        depth[0, r0:r1] = d_obj * scale
        err = _gt_synth_err(feats, depth)
        return err[r0:r1, margin:-margin].mean()

    gt_band = band_err(1.0)
    best = min(band_err(s) for s in
               [0.5, 0.8, 1.0, 1.25, 1.67, 2.0, 2.5, 3.0, 4.0, 5.0, 6.0])
    # constant velocity collapses the band error to <0.3x at the bias
    # (test above); under accel no candidate gets anywhere close
    assert best > 0.55 * gt_band, (best, gt_band)

    # static rows are untouched by the accel: GT still closes them
    err = _gt_synth_err(feats)
    rest = np.concatenate([err[: r0 - 1, margin:-margin],
                           err[r1 + 1:, margin:-margin]]).mean()
    assert rest < 0.02, rest


def test_cmb_objective_neutralizes_moving_object_trap():
    """Objective-level twin of benchmarks/check_dynamic_cmb_tpu.py
    (VERDICT r3 #2): on the moving-object world, the plain rigid
    photometric loss PREFERS the analytically biased band depth
    d_obj/(1-r) over GT -- the trap rigid-only training converges into
    -- while CombinedLoss (losses.py:235-279), given the band's true
    flow, masks the band and removes that incentive. Deterministic
    single forward; the training-dynamics version runs on-chip."""
    from xpt_mde_tpu.losses.total import (CombinedLossMultiScale,
                                          PhotometricLossMultiScale,
                                          TotalLoss)

    data = SyntheticDataset(batch_size=2, height=32, width=64,
                            num_batches=1, varying_depth=True,
                            moving_object=True, seed=7)
    feats = {k: jnp.asarray(v) for k, v in next(iter(data)).items()}
    r0, r1 = data.object_rows()
    r = data.object_vel_ratio
    height, width = data.height, data.width
    fx = float(data.intrinsic[0, 0])

    # analytic GT flow (sampling convention grid - flow): static rows
    # flow_u = fx*o_i/d(v); band rows move WITH the camera at ratio r,
    # so their apparent shift is fx*o_i*(1-r)/d_obj
    offsets = -np.asarray(feats["pose_gt"])[:, :, 0, 3]        # [B, N]
    d_rows = np.asarray(feats["depth_gt"])[:, :, 0, 0]         # [B, H]
    flow_u = fx * offsets[:, :, None] / d_rows[:, None, :]     # [B, N, H]
    flow_u[:, :, r0:r1] *= (1.0 - r)
    flow = np.zeros((2, 4, height, width, 2), np.float32)
    flow[..., 0] = flow_u[..., None]

    def losses(depth):
        preds = {"depth_ms": [jnp.asarray(depth)],
                 "pose": feats["pose_gt"],
                 "flow_ms": [jnp.asarray(flow)]}
        augm = TotalLoss({}, {}).append_data(feats, preds)
        rigid = PhotometricLossMultiScale("L1", [1.0])(feats, preds, augm)
        cmb = CombinedLossMultiScale("L1", [1.0])(feats, preds, augm)
        return float(jnp.mean(rigid)), float(jnp.mean(cmb))

    gt_depth = np.asarray(feats["depth_gt"])
    biased = gt_depth.copy()
    biased[:, r0:r1] = data.object_depth_m / (1.0 - r)

    rigid_gt, cmb_gt = losses(gt_depth)
    rigid_biased, cmb_biased = losses(biased)

    # the trap: the rigid objective strictly prefers the WRONG depth
    assert rigid_biased < 0.8 * rigid_gt, (rigid_biased, rigid_gt)
    # the fix: under cmb the GT depth is at least as good -- the band's
    # violation is masked where the flow branch explains it better, so
    # there is no longer an incentive to move off GT
    assert cmb_gt <= cmb_biased * 1.05, (cmb_gt, cmb_biased)
    # and the preference GAP collapses by an order of magnitude
    rigid_gap = rigid_gt - rigid_biased
    cmb_gap = cmb_gt - cmb_biased
    assert abs(cmb_gap) < 0.1 * rigid_gap, (cmb_gap, rigid_gap)


def test_band_abs_rel_attribution_is_scale_anchored():
    """Pin mini_plan.band_abs_rel's v4 semantics (measured r5: the v3
    full-image median scaler anchored INSIDE the biased band and
    inverted the attribution — the intact static rest read
    |1/2.5 − 1| = 0.6 while the trapped band read ~0). With the scaler
    anchored on the static rows, a band biased by the analytic
    d_obj/(1−r) factor must read as BAND error and a ratio of 2.5,
    regardless of the prediction's global scale."""
    from xpt_mde_tpu.training.mini_plan import band_abs_rel

    rng = np.random.RandomState(0)
    height, width, r0, r1 = 64, 128, 24, 40
    gt = 5.0 + 15.0 * rng.rand(2, height, width)
    for global_scale in (1.0, 3.7):  # monocular depth is scale-free
        pred = gt * global_scale
        pred[:, r0:r1] *= 2.5  # the trap's analytic band bias
        out = band_abs_rel({"depth": pred[..., None],
                            "depth_gt": gt[..., None]}, r0, r1)
        assert abs(out["ratio"] - 2.5) < 1e-6, out
        assert out["rest"] < 1e-6, out
        assert abs(out["band"] - 1.5) < 1e-6, out

    # intact prediction: ratio ~1, both regions ~0, at any scale
    out = band_abs_rel({"depth": (gt * 2.0)[..., None],
                        "depth_gt": gt[..., None]}, r0, r1)
    assert abs(out["ratio"] - 1.0) < 1e-6, out
    assert out["band"] < 1e-6 and out["rest"] < 1e-6, out


def test_planar_world_depth_profile_and_pose():
    data = PlanarSceneDataset(batch_size=1, height=32, width=64,
                              num_batches=1, depth_min=5.0, depth_max=20.0,
                              step_m=0.4, yaw_deg=1.0, seed=1)
    feats = next(iter(data))
    depth = feats["depth_gt"][0, :, :, 0]
    # row-constant, decreasing top->bottom, endpoints at the config
    assert np.allclose(depth, depth[:, :1], atol=1e-4)
    assert np.isclose(depth[0, 0], 20.0, rtol=1e-4)
    assert np.isclose(depth[-1, 0], 5.0, rtol=1e-4)
    assert np.all(np.diff(depth[:, 0]) < 0)

    # pose_gt carries real rotations: relative yaw of +/-1, +/-2 deg
    pose = feats["pose_gt"][0]  # [4, 4, 4] target->source
    for i, t in enumerate([-2, -1, 1, 2]):
        twist = np.asarray(se3.matrix_to_twist(
            jnp.asarray(pose[None, i:i + 1])))[0, 0]
        angle = np.rad2deg(np.linalg.norm(twist[3:]))
        assert np.isclose(angle, abs(t) * 1.0, atol=0.02), (t, angle)


def test_planar_world_gt_closes_synthesis_under_yaw():
    data = PlanarSceneDataset(batch_size=1, height=32, width=64,
                              num_batches=1, depth_min=5.0, depth_max=20.0,
                              step_m=0.4, yaw_deg=1.5, seed=2)
    feats = next(iter(data))
    err = _gt_synth_err(feats)
    # interior (yawed views slide content sideways; borders flow out)
    interior = err[2:-2, 10:-10]
    assert interior.mean() < 0.03, interior.mean()
    # sanity: a wrong pose does NOT close it (the test has teeth)
    wrong = np.array(feats["pose_gt"])
    wrong[:, :, 0, 3] *= 0.5
    err_wrong = _gt_synth_err(feats, None)
    feats_wrong = dict(feats, pose_gt=wrong)
    err_wrong = _gt_synth_err(feats_wrong)
    assert err_wrong[2:-2, 10:-10].mean() > 3 * interior.mean()


def test_planar_world_appearance_cue_tracks_depth():
    """Channel 0 must encode inverse canonical depth (the cue single-
    image depth learns from): correlation with 1/depth near 1."""
    data = PlanarSceneDataset(batch_size=1, height=32, width=64,
                              num_batches=1, depth_min=5.0, depth_max=20.0,
                              seed=4)
    feats = next(iter(data))
    target = feats["image5d"][0, -1]
    inv_depth = 1.0 / feats["depth_gt"][0, :, :, 0]
    row_cue = target[..., 0].mean(axis=1)
    row_inv = inv_depth.mean(axis=1)
    corr = np.corrcoef(row_cue, row_inv)[0, 1]
    assert corr > 0.9, corr
