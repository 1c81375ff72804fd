"""Loss tests: analytic values, masking semantics, recipe orchestration.

Ports the GT-beats-noise property test of
/root/reference/model/loss_and_metric/test_loss.py:79-121 and adds
hand-computed golden values for the photometric / SSIM / smoothness parts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xpt_mde_tpu import config as cfg
from xpt_mde_tpu.losses import photometric as ph
from xpt_mde_tpu.losses import total as tl
from xpt_mde_tpu.utils import se3


def test_l1_masks_black_pixels():
    batch, numsrc, h, w = 1, 2, 4, 4
    synth = np.full((batch, numsrc, h, w, 3), 0.5, np.float32)
    synth[0, 0, 1, 1] = 0.0  # black -> invalid
    target = np.full((batch, h, w, 3), 0.2, np.float32)
    err = np.asarray(ph.photometric_loss_l1(jnp.asarray(synth), jnp.asarray(target),
                                            reduce=False))
    assert np.allclose(err[0, 0, 1, 1], 0.0)
    assert np.allclose(err[0, 0, 0, 0], 0.3, atol=1e-6)
    # reduced: mean over all numsrc*h*w*c cells including masked zeros
    red = np.asarray(ph.photometric_loss_l1(jnp.asarray(synth), jnp.asarray(target)))
    expected = (0.3 * (2 * 16 - 1) * 3) / (2 * 16 * 3)
    assert np.allclose(red[0], expected, atol=1e-6)


def test_avg_pool_excludes_padding():
    """TF avg-pool SAME semantics: corners average 4 cells, edges 6."""
    x = np.ones((1, 1, 3, 3, 1), np.float32)
    x[0, 0, 1, 1, 0] = 10.0
    out = np.asarray(ph.avg_pool_3x3_same(jnp.asarray(x)))
    assert np.isclose(out[0, 0, 1, 1, 0], (8 + 10) / 9)
    assert np.isclose(out[0, 0, 0, 0, 0], (3 + 10) / 4)  # corner: 4 cells
    assert np.isclose(out[0, 0, 0, 1, 0], (5 + 10) / 6)  # edge: 6 cells


def test_ssim_identical_images_zero_loss():
    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, 8, 8, 3).astype(np.float32) + 0.1
    target = img[:, 0]
    loss = np.asarray(ph.photometric_loss_ssim(jnp.asarray(img[:, :1]),
                                               jnp.asarray(target)))
    assert np.all(loss < 1e-3)


def test_ssim_noisy_larger_than_clean():
    rng = np.random.RandomState(1)
    target = rng.rand(1, 8, 8, 3).astype(np.float32)
    clean = target[:, None].repeat(2, axis=1) + 0.02
    noisy = clean + rng.rand(1, 2, 8, 8, 3).astype(np.float32) * 0.5
    l_clean = np.asarray(ph.photometric_loss_ssim(jnp.asarray(clean), jnp.asarray(target)))
    l_noisy = np.asarray(ph.photometric_loss_ssim(jnp.asarray(noisy), jnp.asarray(target)))
    assert l_clean[0] < l_noisy[0]


def test_smoothness_flat_disparity_zero():
    sw = jnp.asarray([1.0, 1.0, 1.0, 1.0][:1])
    loss_obj = tl.SmoothenessLossMultiScale(sw)
    disp = jnp.ones((2, 8, 8, 1))
    image = jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 3).astype(np.float32))
    preds = {"disp_ms": [disp]}
    augm = {"target_ms": [image]}
    loss = np.asarray(loss_obj({}, preds, augm))
    assert np.allclose(loss, 0.0, atol=1e-7)


def test_smoothness_penalizes_gradients_on_flat_image():
    sw = jnp.asarray([1.0])
    loss_obj = tl.SmoothenessLossMultiScale(sw)
    image = jnp.zeros((1, 8, 8, 3))  # flat image -> weights = 1
    u = np.tile(np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1), (1, 8, 1, 1))
    disp = jnp.asarray(u.astype(np.float32))
    loss = np.asarray(loss_obj({}, {"disp_ms": [disp]}, {"target_ms": [image]}))
    # |d/dx| = 1 everywhere -> 0.5 * 1 + 0.5 * 0 = 0.5
    assert np.allclose(loss, 0.5, atol=1e-6)


def _make_features_preds(batch=2, h=16, w=24, numsrc=2, stereo=False, seed=0):
    rng = np.random.RandomState(seed)
    image5d = rng.rand(batch, numsrc + 1, h, w, 3).astype(np.float32) * 2 - 1
    k = np.tile(np.array([[20, 0, w / 2], [0, 20, h / 2], [0, 0, 1]], np.float32),
                (batch, 1, 1))
    features = {"image5d": jnp.asarray(image5d), "intrinsic": jnp.asarray(k)}
    depth_ms = [jnp.asarray(rng.uniform(5, 30, (batch, h // s, w // s, 1))
                            .astype(np.float32)) for s in (1, 2, 4, 8)]
    disp_ms = [1.0 / d for d in depth_ms]
    pose = jnp.asarray(rng.uniform(-0.05, 0.05, (batch, numsrc, 6)).astype(np.float32))
    preds = {"depth_ms": depth_ms, "disp_ms": disp_ms, "pose": pose}
    if stereo:
        features["image5d_R"] = jnp.asarray(
            rng.rand(batch, numsrc + 1, h, w, 3).astype(np.float32) * 2 - 1)
        features["intrinsic_R"] = jnp.asarray(k)
        t_lr = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
        t_lr[:, 0, 3] = 0.5
        features["stereo_T_LR"] = jnp.asarray(t_lr)
        preds["depth_ms_R"] = depth_ms
        preds["disp_ms_R"] = disp_ms
        preds["pose_R"] = pose
        preds["pose_LR"] = jnp.asarray(np.tile(
            np.array([0.5, 0, 0, 0, 0, 0], np.float32), (batch, 1, 1)))
        preds["pose_RL"] = jnp.asarray(np.tile(
            np.array([-0.5, 0, 0, 0, 0, 0], np.float32), (batch, 1, 1)))
    return features, preds


def test_total_loss_mono_recipe():
    features, preds = _make_features_preds()
    recipe = {"L1": 0.5, "SSIM": 0.5, "smoothe": 1.0}
    total = tl.loss_factory(list(features.keys()), recipe, cfg.SCALE_WEIGHT_T1,
                            stereo=False)
    loss, by_type = total(preds, features)
    assert set(by_type.keys()) == {"L1", "SSIM", "smoothe"}
    loss = float(loss)
    assert np.isfinite(loss) and loss > 0
    # weighted sum consistency
    expected = sum(0.5 * float(by_type["L1"]) + 0.5 * float(by_type["SSIM"])
                   + 1.0 * float(by_type["smoothe"]) for _ in [0])
    assert np.isclose(loss, expected, rtol=1e-5)


def test_total_loss_stereo_recipe_and_pruning():
    features, preds = _make_features_preds(stereo=True)
    recipe = dict(cfg.LOSS_RIGID_T2)
    total = tl.loss_factory(list(features.keys()), recipe, cfg.SCALE_WEIGHT_T1,
                            stereo=True)
    loss, by_type = total(preds, features)
    assert "stereoL1" in by_type and "stereoPose" in by_type
    assert np.isfinite(float(loss))

    # pruning: without stereo features, stereo losses are dropped
    mono_feats = {"image5d": features["image5d"], "intrinsic": features["intrinsic"]}
    total2 = tl.loss_factory(list(mono_feats.keys()), recipe, cfg.SCALE_WEIGHT_T1,
                             stereo=False)
    _, by_type2 = total2(
        {k: preds[k] for k in ("depth_ms", "disp_ms", "pose")}, mono_feats)
    assert "stereoL1" not in by_type2 and "L1" in by_type2


def test_stereo_pose_loss_zero_for_exact_pred():
    features, preds = _make_features_preds(stereo=True)
    loss_obj = tl.StereoPoseLoss()
    t_lr = features["stereo_T_LR"]
    preds = dict(preds)
    preds["pose_LR"] = se3.matrix_to_twist(t_lr)[:, None]
    preds["pose_RL"] = se3.matrix_to_twist(se3.invert_matrix(t_lr))[:, None]
    loss = np.asarray(loss_obj(features, preds, {}))
    assert np.allclose(loss, 0.0, atol=1e-8)


def test_gt_pose_photometric_beats_noisy():
    """The canonical self-supervision sanity check (test_loss.py:79-121)."""
    from tests.test_synthesize import make_textured_plane_scene

    sources, k, depth, twist, target, _ = make_textured_plane_scene(
        batch=1, numsrc=2, height=24, width=32)
    image5d = jnp.concatenate([sources, target[:, None]], axis=1)
    features = {"image5d": image5d, "intrinsic": k}
    depth_ms = [depth]
    recipe = {"L1": 1.0}
    total = tl.loss_factory(list(features.keys()), recipe, [4.0], stereo=False)

    preds_gt = {"depth_ms": depth_ms, "pose": twist}
    preds_noisy = {"depth_ms": depth_ms,
                   "pose": twist + jnp.asarray(
                       np.random.RandomState(1).uniform(-0.5, 0.5, twist.shape)
                       .astype(np.float32))}
    loss_gt, _ = total(preds_gt, features)
    loss_noisy, _ = total(preds_noisy, features)
    assert float(loss_gt) < float(loss_noisy)


def test_md2_min_over_sources():
    """MonoDepth2 min-over-sources: a per-pixel-perfect source zeroes the loss."""
    batch, h, w = 1, 8, 8
    target = np.random.RandomState(3).rand(batch, h, w, 3).astype(np.float32)
    good = target[:, None]
    bad = np.clip(target[:, None] + 0.5, 0, 1)
    synth = jnp.asarray(np.concatenate([good, bad], axis=1))
    sw = jnp.asarray([1.0])
    loss_obj = tl.MonoDepth2LossMultiScale("L1", sw)
    augm = {"synth_target_ms": [synth], "target": jnp.asarray(target)}
    loss = np.asarray(loss_obj({}, {}, augm))
    assert np.allclose(loss, 0.0, atol=1e-6)


def test_md2cmb_registered_and_finite():
    """MD2Comb (min-over-source + flow outlier exclusion) is reachable
    through the factory -- the reference defines it but never registers
    it (losses.py:324-374 vs loss_factory.py:9-32)."""
    features, preds = _make_features_preds()
    rng = np.random.RandomState(7)
    b, _, h, w, _ = features["image5d"].shape
    preds["flow_ms"] = [jnp.asarray(
        rng.uniform(-1, 1, (b, 2, h // s, w // s, 2)).astype(np.float32))
        for s in (1, 2, 4, 8)]
    recipe = {"md2cmbL1": 0.7, "md2cmbSSIM": 0.3}
    total = tl.loss_factory(list(features.keys()), recipe,
                            cfg.SCALE_WEIGHT_T1, stereo=False)
    loss, by_type = total(preds, features)
    assert set(by_type.keys()) == {"md2cmbL1", "md2cmbSSIM"}
    assert np.isfinite(float(loss)) and float(loss) > 0
