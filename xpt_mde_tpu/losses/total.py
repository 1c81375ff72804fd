"""Loss orchestration: multi-scale losses, registry, dependency pruning.

Re-designs /root/reference/model/loss_and_metric/losses.py and
loss_factory.py as pure-functional callables over dicts of jnp arrays.

Contracts carried over:
- every loss maps (features, predictions, augm_data) -> [batch];
- multi-scale losses combine per-scale batch losses by a scale-weight
  vector (losses.py:147-154);
- ``TotalLoss`` builds shared augmented data (source/target split, target
  pyramids, synthesized and flow-warped views, stereo cross-synthesis)
  once, then evaluates each registered loss, averages over the *global*
  batch and sums with recipe weights (losses.py:26-55);
- the factory silently drops losses whose required features are absent
  from the dataset config (loss_factory.py:55-74).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import jax.numpy as jnp

from xpt_mde_tpu.losses.photometric import PHOTOMETRIC_FNS
from xpt_mde_tpu.ops.flow_warp import flow_warp_multi_scale
from xpt_mde_tpu.ops.synthesize import synthesize_multi_scale
from xpt_mde_tpu.utils import se3
from xpt_mde_tpu.utils.image import multi_scale_like, resize_image

LossFn = Callable[[Mapping[str, Any], Mapping[str, Any], Mapping[str, Any]],
                  jnp.ndarray]


def _merge_multi_scale(losses: Sequence[jnp.ndarray],
                       scale_weights: jnp.ndarray) -> jnp.ndarray:
    """[scales][batch] -> [batch] via scale-weighted sum."""
    stacked = jnp.stack(losses, axis=0)  # [S, B]
    return jnp.tensordot(scale_weights, stacked, axes=1)


def _resize_bn(images: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize of [B, N, h, w, C] to [B, N, height, width, C]."""
    return resize_image(images, height, width, "bilinear")


class PhotometricLossMultiScale:
    """Per-scale photometric loss vs the scaled target (losses.py:175-195)."""

    def __init__(self, method: str, scale_weights, key_suffix: str = ""):
        self.photo = PHOTOMETRIC_FNS[method]
        self.scale_weights = jnp.asarray(scale_weights, jnp.float32)
        self.sfx = key_suffix

    def __call__(self, features, predictions, augm_data):
        target_ms = augm_data["target_ms" + self.sfx]
        synth_ms = augm_data["synth_target_ms" + self.sfx]
        losses = [self.photo(s, t) for s, t in zip(synth_ms, target_ms)]
        return _merge_multi_scale(losses, self.scale_weights)


class MonoDepth2LossMultiScale:
    """Min-over-sources photometric loss at full resolution (losses.py:198-232)."""

    def __init__(self, method: str, scale_weights, key_suffix: str = ""):
        self.photo = PHOTOMETRIC_FNS[method]
        self.scale_weights = jnp.asarray(scale_weights, jnp.float32)
        self.sfx = key_suffix

    def __call__(self, features, predictions, augm_data):
        synth_ms = augm_data["synth_target_ms" + self.sfx]
        target = augm_data["target" + self.sfx]
        ho, wo = target.shape[1:3]
        losses = []
        for synth in synth_ms:
            synth_rsz = _resize_bn(synth, ho, wo)
            err = self.photo(synth_rsz, target, reduce=False)  # [B,N,H,W,C]
            err = jnp.min(err, axis=1)
            losses.append(jnp.mean(err, axis=(1, 2, 3)))
        return _merge_multi_scale(losses, self.scale_weights)


class CombinedLossMultiScale:
    """Static loss masked where it exceeds the optical-flow loss
    (losses.py:235-279)."""

    def __init__(self, method: str, scale_weights, key_suffix: str = ""):
        self.photo = PHOTOMETRIC_FNS[method]
        self.scale_weights = jnp.asarray(scale_weights, jnp.float32)
        self.sfx = key_suffix

    def __call__(self, features, predictions, augm_data):
        synth_ms = augm_data["synth_target_ms" + self.sfx]
        warped_ms = augm_data["warped_target_ms" + self.sfx]
        target = augm_data["target" + self.sfx]
        ho, wo = target.shape[1:3]
        flow_loss = self.photo(_resize_bn(warped_ms[0], ho, wo), target,
                               reduce=False)
        losses = []
        for synth in synth_ms:
            static = self.photo(_resize_bn(synth, ho, wo), target, reduce=False)
            static = static * (static < flow_loss).astype(static.dtype)
            losses.append(jnp.mean(static, axis=(1, 2, 3, 4)))
        return _merge_multi_scale(losses, self.scale_weights)


class MoALossMultiScale:
    """Minimum over {temporal synth views, stereo synth view} per pixel
    (losses.py:282-321)."""

    def __init__(self, method: str, scale_weights, key_suffix: str = ""):
        self.photo = PHOTOMETRIC_FNS[method]
        self.scale_weights = jnp.asarray(scale_weights, jnp.float32)
        self.sfx = key_suffix

    def __call__(self, features, predictions, augm_data):
        temp_ms = augm_data["synth_target_ms" + self.sfx]
        stro_ms = augm_data["stereo_synth_ms" + self.sfx]
        target = augm_data["target" + self.sfx]
        ho, wo = target.shape[1:3]
        losses = []
        for temp, stro in zip(temp_ms, stro_ms):
            temp_loss = self.photo(_resize_bn(temp, ho, wo), target, reduce=False)
            stro_loss = self.photo(_resize_bn(stro, ho, wo), target, reduce=False)
            moa = jnp.concatenate([temp_loss, stro_loss], axis=1)
            moa = jnp.min(moa, axis=1)
            losses.append(jnp.mean(moa, axis=(1, 2, 3)))
        return _merge_multi_scale(losses, self.scale_weights)


class MD2CombLossMultiScale:
    """Min-over-sources with flow-based outlier exclusion (losses.py:324-374)."""

    def __init__(self, method: str, scale_weights, key_suffix: str = ""):
        self.photo = PHOTOMETRIC_FNS[method]
        self.scale_weights = jnp.asarray(scale_weights, jnp.float32)
        self.sfx = key_suffix

    def __call__(self, features, predictions, augm_data):
        synth_ms = augm_data["synth_target_ms" + self.sfx]
        warped_ms = augm_data["warped_target_ms" + self.sfx]
        target = augm_data["target" + self.sfx]
        ho, wo = target.shape[1:3]
        flow_loss = self.photo(_resize_bn(warped_ms[0], ho, wo), target,
                               reduce=False)
        losses = []
        for synth in synth_ms:
            static = self.photo(_resize_bn(synth, ho, wo), target, reduce=False)
            outlier = (static > flow_loss * 2.0).astype(static.dtype)
            static = static + outlier * 1000.0
            static = jnp.min(static, axis=1)  # [B,H,W,C]
            keep = (static < 1000.0).astype(static.dtype)
            count = jnp.maximum(jnp.sum(keep), 1.0)
            losses.append(jnp.sum(static * keep, axis=(1, 2, 3)) / count)
        return _merge_multi_scale(losses, self.scale_weights)


class SmoothenessLossMultiScale:
    """Edge-aware disparity smoothness (losses.py:386-440)."""

    def __init__(self, scale_weights, key_suffix: str = "",
                 image_gradient_factor: float = 4.0):
        self.scale_weights = jnp.asarray(scale_weights, jnp.float32)
        self.sfx = key_suffix
        self.grad_factor = image_gradient_factor

    def __call__(self, features, predictions, augm_data):
        disp_ms = predictions["disp_ms" + self.sfx]
        target_ms = augm_data["target_ms" + self.sfx]
        orig_width = target_ms[0].shape[2]
        losses = []
        for disp, image in zip(disp_ms, target_ms):
            scale = orig_width / image.shape[2]
            losses.append(self.smootheness_loss(disp, image) / scale)
        return _merge_multi_scale(losses, self.scale_weights)

    def smootheness_loss(self, disp, image):
        def grad_x(img):
            return img[:, :, :-1] - img[:, :, 1:]

        def grad_y(img):
            return img[:, :-1] - img[:, 1:]

        disp_gx, disp_gy = grad_x(disp), grad_y(disp)
        img_gx, img_gy = grad_x(image), grad_y(image)
        wx = jnp.exp(-jnp.mean(jnp.abs(img_gx * self.grad_factor), 3, keepdims=True))
        wy = jnp.exp(-jnp.mean(jnp.abs(img_gy * self.grad_factor), 3, keepdims=True))
        sx = 0.5 * jnp.mean(jnp.abs(disp_gx * wx), axis=(1, 2, 3))
        sy = 0.5 * jnp.mean(jnp.abs(disp_gy * wy), axis=(1, 2, 3))
        return sx + sy


class StereoDepthLoss:
    """Photometric consistency of L<->R cross-synthesized views
    (losses.py:443-478)."""

    def __init__(self, method: str, scale_weights):
        self.photo = PHOTOMETRIC_FNS[method]
        self.scale_weights = jnp.asarray(scale_weights, jnp.float32)

    def __call__(self, features, predictions, augm_data):
        loss_l = self._side(augm_data["stereo_synth_ms"], augm_data["target_ms"])
        loss_r = self._side(augm_data["stereo_synth_ms_R"], augm_data["target_ms_R"])
        losses = [l + r for l, r in zip(loss_l, loss_r)]
        return _merge_multi_scale(losses, self.scale_weights)

    def _side(self, synth_ms, target_ms):
        return [self.photo(s, t) for s, t in zip(synth_ms, target_ms)]


class StereoPoseLoss:
    """MSE of predicted stereo twists vs GT extrinsic, both directions
    (losses.py:481-494)."""

    def __call__(self, features, predictions, augm_data):
        pose_lr_pred = predictions["pose_LR"]  # [B, 1, 6]
        pose_rl_pred = predictions["pose_RL"]
        t_lr = features["stereo_T_LR"][:, None]  # [B, 1, 4, 4]
        pose_lr_true = se3.matrix_to_twist(t_lr)
        pose_rl_true = se3.matrix_to_twist(se3.invert_matrix(t_lr))
        loss = (jnp.mean((pose_lr_true - pose_lr_pred) ** 2, axis=-1)
                + jnp.mean((pose_rl_true - pose_rl_pred) ** 2, axis=-1))
        return jnp.mean(loss, axis=1)


class FlowWarpLossMultiScale:
    """Photometric loss on flow-warped targets (losses.py:497-519)."""

    def __init__(self, method: str, scale_weights, key_suffix: str = ""):
        self.photo = PHOTOMETRIC_FNS[method]
        self.scale_weights = jnp.asarray(scale_weights, jnp.float32)
        self.sfx = key_suffix

    def __call__(self, features, predictions, augm_data):
        flow_target_ms = augm_data["flow_target_ms" + self.sfx]
        warped_ms = augm_data["warped_target_ms" + self.sfx]
        losses = [self.photo(w, t) for w, t in zip(warped_ms, flow_target_ms)]
        return _merge_multi_scale(losses, self.scale_weights)


class L2Regularizer:
    """L2 regularization over a weight pytree (losses.py:522-533).

    The wrapped pytree is supplied at call time via
    ``predictions["regularize_weights"]`` so the loss stays functional.
    """

    def __call__(self, features, predictions, augm_data):
        import jax

        weights = predictions.get("regularize_weights")
        batch = features["image5d"].shape[0]
        if weights is None:
            return jnp.zeros((batch,))
        leaves = jax.tree_util.tree_leaves(weights)
        loss = sum(0.5 * jnp.sum(jnp.square(w)) for w in leaves)
        return jnp.full((batch,), loss)


class TotalLoss:
    """Weighted sum of registered losses over shared augmented data."""

    def __init__(self, loss_objects: Mapping[str, LossFn],
                 loss_weights: Mapping[str, float], stereo: bool = False,
                 batch_size: int | None = None):
        self.loss_objects = dict(loss_objects)
        self.loss_weights = dict(loss_weights)
        self.stereo = stereo
        self.batch_size = batch_size

    def __call__(self, predictions, features):
        """:return: (total_loss scalar, loss_by_type dict of scalars)"""
        augm_data = self.append_data(features, predictions)
        if self.stereo and ("image5d_R" in features):
            augm_data.update(self.append_data(features, predictions, "_R"))
            augm_data.update(self.synthesize_stereo(features, predictions, augm_data))

        batch = features["image5d"].shape[0]
        global_batch = self.batch_size or batch
        total = 0.0
        loss_by_type = {}
        for name, loss_obj in self.loss_objects.items():
            loss_batch = loss_obj(features, predictions, augm_data)
            # compute_average_loss semantics: sum over the (global) batch
            # divided by global batch size (losses.py:49)
            loss_mean = jnp.sum(loss_batch) / global_batch
            total = total + loss_mean * self.loss_weights[name]
            loss_by_type[name] = loss_mean
        return total, loss_by_type

    def append_data(self, features, predictions, suffix: str = ""):
        """Build shared intermediates: source/target split, target pyramid,
        synthesized and flow-warped target views (losses.py:57-103)."""
        image5d = features["image5d" + suffix]
        intrinsic = features["intrinsic" + suffix]
        source = image5d[:, :-1]
        target = image5d[:, -1]
        augm = {"source" + suffix: source, "target" + suffix: target}

        if ("depth_ms" + suffix in predictions) and ("pose" + suffix in predictions):
            depth_ms = predictions["depth_ms" + suffix]
            pose = predictions["pose" + suffix]
            augm["target_ms" + suffix] = multi_scale_like(target, depth_ms)
            augm["synth_target_ms" + suffix] = synthesize_multi_scale(
                source, intrinsic, depth_ms, pose)

        if "flow_ms" + suffix in predictions:
            flow_ms = predictions["flow_ms" + suffix]
            augm["flow_target_ms" + suffix] = multi_scale_like(target, flow_ms)
            augm["warped_target_ms" + suffix] = flow_warp_multi_scale(source, flow_ms)
        return augm

    def synthesize_stereo(self, features, predictions, augm_data):
        """Cross-synthesize left from right and right from left using the
        stereo extrinsic (losses.py:105-140)."""
        out = {}
        if ("stereo_T_LR" not in features) or ("depth_ms" not in predictions):
            return out
        t_lr = features["stereo_T_LR"]  # [B, 4, 4]
        # matrices go in directly (synthesize_multi_scale accepts 4x4);
        # the reference's matrix->twist->matrix round-trip is an
        # implementation detail, not semantics. The LEFT intrinsic is
        # used for BOTH directions -- reference parity (losses.py:126-138
        # passes features["intrinsic"] to both SynthesizeMultiScale calls)
        out["stereo_synth_ms"] = synthesize_multi_scale(
            augm_data["target_R"][:, None], features["intrinsic"],
            predictions["depth_ms"], se3.invert_matrix(t_lr)[:, None])
        out["stereo_synth_ms_R"] = synthesize_multi_scale(
            augm_data["target"][:, None], features["intrinsic"],
            predictions["depth_ms_R"], t_lr[:, None])
        return out


# ---------------------------------------------------------------------------
# registry / factory

LOSS_DEPENDENCIES = [
    (["L1", "SSIM", "md2L1", "md2SSIM", "cmbL1", "cmbSSIM", "md2cmbL1",
      "md2cmbSSIM", "moaL1", "moaSSIM", "smoothe", "flowL2", "flow_reg"],
     ["image", "intrinsic"]),
    (["L1_R", "SSIM_R", "md2L1_R", "md2SSIM_R", "cmbL1_R", "cmbSSIM_R",
      "md2cmbL1_R", "md2cmbSSIM_R", "moaL1_R", "moaSSIM_R", "smoothe_R",
      "flowL2_R"],
     ["image_R", "intrinsic_R"]),
    (["stereoL1", "stereoSSIM", "stereoPose",
      "moaL1", "moaSSIM", "moaL1_R", "moaSSIM_R"],
     ["image", "intrinsic", "image_R", "intrinsic_R", "stereo_T_LR"]),
]


def check_loss_dependency(loss_key: str, dataset_keys) -> bool:
    """True if all features required by ``loss_key`` exist in the dataset.

    Mirrors loss_factory.py:55-74, extended so MoA losses (which consume
    stereo cross-synthesis) also require the stereo extrinsic.
    """
    # dataset configs list "image"; loaded feature dicts carry the derived
    # "image5d" view -- accept either spelling
    dataset_keys = {k.replace("image5d", "image") for k in dataset_keys}
    for loss_names, data_names in LOSS_DEPENDENCIES:
        if loss_key in loss_names:
            for dep in data_names:
                if dep not in dataset_keys:
                    print(f"[check_loss_dependency] drop {loss_key}: "
                          f"{dep} not in dataset")
                    return False
    return True


def loss_factory(dataset_keys, loss_weights: Mapping[str, float],
                 scale_weights, stereo: bool = True,
                 batch_size: int | None = None,
                 image_gradient_factor: float = 4.0) -> TotalLoss:
    """Build a TotalLoss from a recipe dict (loss_factory.py:6-52)."""
    sw = jnp.asarray(scale_weights, jnp.float32)
    pool: dict[str, LossFn] = {}
    for sfx in ("", "_R"):
        pool["L1" + sfx] = PhotometricLossMultiScale("L1", sw, sfx)
        pool["SSIM" + sfx] = PhotometricLossMultiScale("SSIM", sw, sfx)
        pool["md2L1" + sfx] = MonoDepth2LossMultiScale("L1", sw, sfx)
        pool["md2SSIM" + sfx] = MonoDepth2LossMultiScale("SSIM", sw, sfx)
        pool["cmbL1" + sfx] = CombinedLossMultiScale("L1", sw, sfx)
        pool["cmbSSIM" + sfx] = CombinedLossMultiScale("SSIM", sw, sfx)
        # the reference defines this variant but forgets to register it
        # (losses.py:324-374 vs loss_factory.py:9-32); here it is usable
        pool["md2cmbL1" + sfx] = MD2CombLossMultiScale("L1", sw, sfx)
        pool["md2cmbSSIM" + sfx] = MD2CombLossMultiScale("SSIM", sw, sfx)
        pool["moaL1" + sfx] = MoALossMultiScale("L1", sw, sfx)
        pool["moaSSIM" + sfx] = MoALossMultiScale("SSIM", sw, sfx)
        pool["smoothe" + sfx] = SmoothenessLossMultiScale(
            sw, sfx, image_gradient_factor)
        pool["flowL2" + sfx] = FlowWarpLossMultiScale("L2", sw, sfx)
    pool["stereoL1"] = StereoDepthLoss("L1", sw)
    pool["stereoSSIM"] = StereoDepthLoss("SSIM", sw)
    pool["stereoPose"] = StereoPoseLoss()
    pool["flow_reg"] = L2Regularizer()

    losses, weights = {}, {}
    for name, weight in loss_weights.items():
        if weight == 0.0 or not check_loss_dependency(name, dataset_keys):
            continue
        losses[name] = pool[name]
        weights[name] = weight
    return TotalLoss(losses, weights, stereo, batch_size)
