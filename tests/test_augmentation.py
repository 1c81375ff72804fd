"""Augmentation math tests.

Ports the analytic assertions of
/root/reference/model/model_util/augmentation.py:227-330: crop-box
validity, intrinsic adjustment under crop and flip, pose conjugation
under flip -- plus geometric-consistency checks (a cropped/flipped view
must still reproject consistently with its adjusted intrinsics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpt_mde_tpu.training.augmentation import (ColorJitter, CropAndResize,
                                               HorizontalFlip, TotalAugment,
                                               augmentation_factory)


def _features(batch=2, s=5, h=32, w=64, seed=0, stereo=False):
    rng = np.random.RandomState(seed)
    k = np.tile(np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                         np.float32), (batch, 1, 1))
    feats = {
        "image5d": jnp.asarray(rng.rand(batch, s, h, w, 3)
                               .astype(np.float32) * 2 - 1),
        "intrinsic": jnp.asarray(k),
        "pose_gt": jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                       (batch, s - 1, 1, 1))),
    }
    if stereo:
        feats["stereo_T_LR"] = jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1)))
    return feats


def test_crop_box_distribution():
    """Box offsets in [0, half_crop_ratio], 'no crop' with prob 1-p
    (augmentation.py:94-109)."""
    aug = CropAndResize(aug_prob=0.5)
    feats = _features()
    crops = 0
    for i in range(50):
        out = aug(dict(feats), jax.random.PRNGKey(i))
        k = np.asarray(out["intrinsic"][0])
        assert k[0, 0] >= 40.0 - 1e-4  # crop only zooms in
        if k[0, 0] > 40.0 + 1e-4:
            crops += 1
        assert k[0, 0] <= 40.0 / 0.8 + 1e-3  # max 10% off each side
    assert 5 < crops < 50  # crop happens sometimes, not always


def test_crop_intrinsic_consistency():
    """A world point projected with the adjusted intrinsics lands on the
    same image content after crop+resize."""
    aug = CropAndResize(aug_prob=1.0)
    feats = _features()
    out = aug(dict(feats), jax.random.PRNGKey(3))
    k_new = np.asarray(out["intrinsic"][0])
    k_old = np.asarray(feats["intrinsic"][0])
    # zoom factors consistent between fx and cx adjustments:
    # cx' = (cx - x1*W) * zx, fx' = fx * zx -> recover the same x1 twice
    zx = k_new[0, 0] / k_old[0, 0]
    zy = k_new[1, 1] / k_old[1, 1]
    assert zx >= 1.0 and zy >= 1.0
    x1w = k_old[0, 2] - k_new[0, 2] / zx
    y1h = k_old[1, 2] - k_new[1, 2] / zy
    assert 0.0 - 1e-3 <= x1w <= 0.1 * 64 + 1e-3
    assert 0.0 - 1e-3 <= y1h <= 0.1 * 32 + 1e-3


def test_flip_intrinsic_and_pose_conjugation():
    """cx' = W - cx; pose conjugated by T_flip (augmentation.py:169-185)."""
    aug = HorizontalFlip(aug_prob=1.0)
    batch, w = 2, 64
    feats = _features(batch=batch, w=w)
    pose = np.tile(np.eye(4, dtype=np.float32), (batch, 4, 1, 1))
    pose[:, :, 0, 3] = 1.5   # x translation
    pose[:, :, 1, 3] = 0.7   # y translation
    # small rotation about z
    c, s = np.cos(0.1), np.sin(0.1)
    pose[:, :, 0, 0], pose[:, :, 0, 1] = c, -s
    pose[:, :, 1, 0], pose[:, :, 1, 1] = s, c
    feats["pose_gt"] = jnp.asarray(pose)

    out = aug(dict(feats), jax.random.PRNGKey(0))
    k = np.asarray(out["intrinsic"][0])
    assert np.isclose(k[0, 2], w - w / 2)
    assert np.isclose(k[0, 0], 40.0)  # fx preserved (abs)

    flipped = np.asarray(out["pose_gt"][0, 0])
    t_flip = np.diag([-1.0, 1, 1, 1])
    expected = t_flip @ pose[0, 0] @ np.linalg.inv(t_flip)
    assert np.allclose(flipped, expected, atol=1e-6)
    # x-translation negated, y preserved
    assert np.isclose(flipped[0, 3], -1.5)
    assert np.isclose(flipped[1, 3], 0.7)
    # images actually flipped
    assert np.allclose(np.asarray(out["image5d"][0, 0]),
                       np.asarray(feats["image5d"][0, 0])[:, ::-1])


def test_flip_preserves_rigidity():
    """Conjugated poses remain valid SE(3) transforms."""
    aug = HorizontalFlip(aug_prob=1.0)
    rng = np.random.RandomState(1)
    from xpt_mde_tpu.utils import se3
    twists = rng.uniform(-0.5, 0.5, (2, 4, 6)).astype(np.float32)
    feats = _features()
    feats["pose_gt"] = se3.twist_to_matrix(jnp.asarray(twists))
    out = aug(dict(feats), jax.random.PRNGKey(0))
    rot = np.asarray(out["pose_gt"])[..., :3, :3]
    eye = np.broadcast_to(np.eye(3), rot.shape)
    assert np.allclose(rot @ np.swapaxes(rot, -1, -2), eye, atol=1e-5)


def test_color_jitter_range_and_gating():
    aug = ColorJitter(aug_prob=1.0)
    feats = _features(seed=5)
    out = aug(dict(feats), jax.random.PRNGKey(2))
    img = np.asarray(out["image5d"])
    assert img.min() >= -1.0 - 1e-5 and img.max() <= 1.0 + 1e-5
    assert not np.allclose(img, np.asarray(feats["image5d"]))

    never = ColorJitter(aug_prob=0.0)
    out2 = never(dict(feats), jax.random.PRNGKey(2))
    assert np.allclose(np.asarray(out2["image5d"]),
                       np.asarray(feats["image5d"]))


def test_total_augment_jittable():
    """The full chain must run inside jit (it runs inside the train step)."""
    aug = augmentation_factory({"CropAndResize": 0.5, "HorizontalFlip": 0.5,
                                "ColorJitter": 0.5})
    feats = _features(stereo=True)

    @jax.jit
    def apply(feats, rng):
        return aug(dict(feats), rng)

    out = apply(feats, jax.random.PRNGKey(0))
    assert out["image5d"].shape == feats["image5d"].shape
    assert np.isfinite(np.asarray(out["image5d"])).all()


def test_crop_depth_gt_nearest():
    """depth_gt cropped with NEAREST (sparse values never interpolated),
    aligned with the cropped image (augmentation.py:88-91)."""
    aug = CropAndResize(aug_prob=1.0)
    feats = _features()
    depth = np.zeros((2, 32, 64, 1), np.float32)
    depth[:, ::4, ::4] = 7.5  # sparse
    feats["depth_gt"] = jnp.asarray(depth)
    out = aug(dict(feats), jax.random.PRNGKey(1))
    cropped = np.asarray(out["depth_gt"])
    vals = np.unique(cropped)
    assert set(vals.tolist()) <= {0.0, 7.5}  # no interpolated values
    assert (cropped == 7.5).sum() > 0
