"""On-device batch augmentation: crop+resize, horizontal flip, color jitter.

Re-designs /root/reference/model/model_util/augmentation.py as pure
jittable functions over (features, rng). Semantics carried over:

- one augmentation decision / parameter set per *batch* (the reference
  shares the crop box and flip decision across the batch);
- CropAndResize adjusts the intrinsics: cx' = (cx - x1*W) * W/cropW,
  fx' = fx * W/cropW (augmentation.py:111-129);
- HorizontalFlip conjugates every pose by T_flip = diag(-1,1,1,1):
  P' = T P T^-1 (augmentation.py:175-185) and mirrors cx' = W - cx;
- ColorJitter applies gamma in [0.5, 1.5] and saturation in [0.5, 1.5]
  on the [0,1] image (saturation here is a linear gray blend rather than
  an HSV roundtrip -- same knob, XLA-friendlier).

All ops are static-shaped: the dynamic crop is a scale_and_translate
resize, so everything fuses under jit.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp


_T_FLIP = jnp.diag(jnp.asarray([-1.0, 1.0, 1.0, 1.0]))


def _conjugate_flip(pose: jnp.ndarray) -> jnp.ndarray:
    """T_flip @ P @ T_flip^-1 (T_flip is its own inverse)."""
    return _T_FLIP @ pose @ _T_FLIP


class CropAndResize:
    """Random crop (shared across batch) resized back to full size."""

    def __init__(self, aug_prob: float = 0.2, half_crop_ratio: float = 0.1):
        self.aug_prob = aug_prob
        self.half_crop_ratio = half_crop_ratio

    def __call__(self, features: dict, rng) -> dict:
        image = features["image5d"]
        height, width = image.shape[-3:-1]
        k1, k2 = jax.random.split(rng)
        # box distribution (augmentation.py:94-109): with prob aug_prob the
        # offsets land in (0, half_crop_ratio]; clipping the rest to 0 makes
        # "no crop" the 1-aug_prob case
        maxval1 = self.half_crop_ratio
        minval1 = -(1.0 - self.aug_prob) * self.half_crop_ratio / self.aug_prob
        y1x1 = jnp.clip(jax.random.uniform(k1, (2,), minval=minval1,
                                           maxval=maxval1), 0.0, 1.0)
        y2x2 = jnp.clip(jax.random.uniform(k2, (2,), minval=1.0 - maxval1,
                                           maxval=1.0 - minval1), 0.0, 1.0)
        box = jnp.concatenate([y1x1, y2x2])  # (y1, x1, y2, x2) in [0, 1]

        def crop_im(img5d):
            return _crop_resize_5d(img5d, box)

        features = dict(features)
        features["image5d"] = crop_im(features["image5d"])
        features["intrinsic"] = self._adjust_intrinsic(
            features["intrinsic"], box, height, width)
        if "image5d_R" in features:
            features["image5d_R"] = crop_im(features["image5d_R"])
            features["intrinsic_R"] = self._adjust_intrinsic(
                features["intrinsic_R"], box, height, width)
        # GT depth cropped nearest (sparse maps must not be interpolated)
        # so the in-training depth metric stays aligned with the cropped
        # view (augmentation.py:88-91)
        for key in ("depth_gt", "depth_gt_R"):
            if key in features:
                features[key] = _crop_nearest(features[key], box)
        return features

    @staticmethod
    def _adjust_intrinsic(intrinsic, box, height, width):
        y1, x1, y2, x2 = box[0], box[1], box[2], box[3]
        center = jnp.stack([
            jnp.stack([jnp.zeros(()), jnp.zeros(()), x1 * width]),
            jnp.stack([jnp.zeros(()), jnp.zeros(()), y1 * height]),
            jnp.zeros((3,)),
        ])
        cropped = intrinsic - center
        x_ratio = 1.0 / (x2 - x1)
        y_ratio = 1.0 / (y2 - y1)
        return jnp.stack([cropped[:, 0] * x_ratio, cropped[:, 1] * y_ratio,
                          cropped[:, 2]], axis=1)


def _crop_resize_5d(image5d: jnp.ndarray, box: jnp.ndarray,
                    method: str = "linear") -> jnp.ndarray:
    """Crop normalized ``box`` = (y1, x1, y2, x2) and resize back to the
    original (H, W), batched over leading dims. Static-shaped via
    scale_and_translate."""
    b, s, h, w, c = image5d.shape
    flat = image5d.reshape(b * s, h, w, c)
    y1, x1, y2, x2 = box[0], box[1], box[2], box[3]
    scale = jnp.stack([1.0 / (y2 - y1), 1.0 / (x2 - x1)])
    translation = jnp.stack([-y1 * h * scale[0], -x1 * w * scale[1]])
    out = jax.image.scale_and_translate(
        flat, flat.shape, (1, 2), scale, translation, method=method)
    return out.reshape(b, s, h, w, c)


def _crop_nearest(image: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor crop+resize of [B, H, W, C] (sparse depth maps)."""
    h, w = image.shape[1:3]
    y1, x1, y2, x2 = box[0], box[1], box[2], box[3]
    vy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (y2 - y1) + y1 * h
    vx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (x2 - x1) + x1 * w
    iy = jnp.clip(jnp.floor(vy), 0, h - 1).astype(jnp.int32)
    ix = jnp.clip(jnp.floor(vx), 0, w - 1).astype(jnp.int32)
    return jnp.take(jnp.take(image, iy, axis=1), ix, axis=2)


class HorizontalFlip:
    def __init__(self, aug_prob: float = 0.2):
        self.aug_prob = aug_prob

    def __call__(self, features: dict, rng) -> dict:
        do_flip = jax.random.uniform(rng) < self.aug_prob
        flipped = self._flip(features)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_flip, b, a), dict(features), flipped)

    def _flip(self, features: dict) -> dict:
        width = features["image5d"].shape[-2]
        out = dict(features)
        for key in ("image5d", "image5d_R"):
            if key in features:
                out[key] = features[key][..., ::-1, :]
        for key in ("intrinsic", "intrinsic_R"):
            if key in features:
                wh = jnp.asarray([[0.0, 0.0, width], [0.0, 0.0, 0.0],
                                  [0.0, 0.0, 0.0]])
                out[key] = jnp.abs(wh - features[key])
        for key in ("pose_gt", "pose_gt_R", "stereo_T_LR"):
            if key in features:
                out[key] = _conjugate_flip(features[key])
        return out


class ColorJitter:
    def __init__(self, aug_prob: float = 0.2):
        self.aug_prob = aug_prob

    def __call__(self, features: dict, rng) -> dict:
        k1, k2, k3 = jax.random.split(rng, 3)
        do_jit = jax.random.uniform(k1) < self.aug_prob
        gamma = jax.random.uniform(k2, minval=0.5, maxval=1.5)
        saturation = jax.random.uniform(k3, minval=0.5, maxval=1.5)

        features = dict(features)
        for key in ("image5d", "image5d_R"):
            if key in features:
                jittered = self._jitter(features[key], gamma, saturation)
                features[key] = jnp.where(do_jit, jittered, features[key])
        return features

    @staticmethod
    def _jitter(image, gamma, saturation):
        x = (image + 1.0) / 2.0
        gray = jnp.mean(x, axis=-1, keepdims=True)
        x = jnp.clip(gray + saturation * (x - gray), 0.0, 1.0)
        x = jnp.power(jnp.maximum(x, 1e-6), gamma)
        return x * 2.0 - 1.0


class TotalAugment:
    """Chain of augmenters applied with independent rng streams."""

    def __init__(self, augmenters: Sequence):
        self.augmenters = list(augmenters)

    def __call__(self, features: dict, rng) -> dict:
        if not self.augmenters:
            return features
        keys = jax.random.split(rng, len(self.augmenters))
        for aug, key in zip(self.augmenters, keys):
            features = aug(features, key)
        return features


def augmentation_factory(augment_probs: Mapping[str, float] | None) -> TotalAugment:
    """Build the augment chain from a {name: prob} dict
    (augmentation.py:5-19)."""
    augment_probs = augment_probs or {}
    augmenters = []
    for key, prob in augment_probs.items():
        if key == "CropAndResize":
            augmenters.append(CropAndResize(prob))
        elif key == "HorizontalFlip":
            augmenters.append(HorizontalFlip(prob))
        elif key == "ColorJitter":
            augmenters.append(ColorJitter(prob))
        else:
            raise ValueError(f"Wrong augmentation type: {key}")
    return TotalAugment(augmenters)
