"""Model factory + composite model.

Re-designs /root/reference/model/build_model/model_factory.py and
model_wrappers.py. Instead of a python wrapper over separate keras models,
the composite is itself a Flax module (one params tree, one checkpoint,
jit-friendly):

- ``VodeModel.__call__(features)`` runs each sub-net on ``image5d`` and
  merges prediction dicts, deriving ``disp_ms = 1/depth_ms``
  [model_wrappers.py:41-51];
- with stereo data it re-runs on the ``_R`` views [model_wrappers.py:137-145];
- with a stereo extrinsic + posenet it predicts the L<->R stereo pose by
  feeding [R_target]*numsrc + [L_target] snippets into posenet
  [model_wrappers.py:161-177].

Per-net trainability (flownet frozen in joint stages, model_main.py:88-90)
is handled functionally by the optimizer masks in training/optimizers.py,
not by mutating modules.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp

from xpt_mde_tpu.models import depth_net as dn
from xpt_mde_tpu.models import pose_net as pn
from xpt_mde_tpu.models.backbones import BACKBONE_NAMES, backbone_factory
from xpt_mde_tpu.models.layers import activation_factory
from xpt_mde_tpu.utils.image import safe_reciprocal_ms


class VodeModel(nn.Module):
    """Composite {depthnet, posenet, flownet} model with stereo handling."""

    depthnet: Optional[nn.Module] = None
    posenet: Optional[nn.Module] = None
    flownet: Optional[nn.Module] = None
    stereo: bool = False
    stereo_pose: bool = False

    @nn.compact
    def __call__(self, features: Mapping[str, Any], train: bool = False):
        preds = self.predict_batch(features, "", train)
        if self.stereo and "image5d_R" in features:
            preds.update(self.predict_batch(features, "_R", train))
            if self.stereo_pose and self.posenet is not None:
                preds.update(self.predict_stereo_pose(features, train))
        return preds

    def predict_batch(self, features, suffix: str, train: bool):
        image5d = features["image5d" + suffix]
        preds = {}
        if self.depthnet is not None:
            preds.update(self.depthnet(image5d, train=train))
        if self.posenet is not None:
            preds.update(self.posenet(image5d, train=train))
        if self.flownet is not None:
            preds.update(self.flownet(image5d, train=train))
        if "depth_ms" in preds:
            preds["disp_ms"] = safe_reciprocal_ms(preds["depth_ms"])
        return {key + suffix: value for key, value in preds.items()}

    def predict_stereo_pose(self, features, train: bool):
        left_target = features["image5d"][:, -1]
        right_target = features["image5d_R"][:, -1]
        numsrc = features["image5d"].shape[1] - 1
        lr_input = jnp.stack([right_target] * numsrc + [left_target], axis=1)
        rl_input = jnp.stack([left_target] * numsrc + [right_target], axis=1)
        pose_lr = self.posenet(lr_input, train=train)
        pose_rl = self.posenet(rl_input, train=train)
        return {"pose_LR": pose_lr["pose"], "pose_RL": pose_rl["pose"]}


class ModelFactory:
    """Builds a VodeModel per net-name dict (model_factory.py:18-64)."""

    def __init__(self, dataset_keys, net_names: Mapping[str, str],
                 depth_activation: str = "InverseSigmoid",
                 stereo: bool = True, high_res: bool = False,
                 upsample_interp: str = "nearest",
                 compute_dtype: str = "float32",
                 remat_backbone: bool = False):
        self.dataset_keys = {k.replace("image5d", "image") for k in dataset_keys}
        self.net_names = dict(net_names)
        self.depth_activation = depth_activation
        self.stereo = stereo
        self.high_res = high_res
        self.upsample_interp = upsample_interp
        self.dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        # rematerialize backbone activations in the backward pass: trades
        # FLOPs for HBM, the standard TPU lever for high-res batches
        self.remat_backbone = remat_backbone

    def get_model(self) -> VodeModel:
        depthnet = posenet = flownet = None
        if "depth" in self.net_names:
            depthnet = self.depth_net_factory(self.net_names["depth"])
        if "camera" in self.net_names:
            posenet = self.pose_net_factory(self.net_names["camera"])
        if "flow" in self.net_names:
            flownet = self.flow_net_factory(self.net_names["flow"])

        # wrapper selection (model_factory.py:57-63)
        stereo_pose = ("stereo_T_LR" in self.dataset_keys
                       and depthnet is not None)
        stereo = stereo_pose or ("image_R" in self.dataset_keys and self.stereo)
        return VodeModel(depthnet=depthnet, posenet=posenet, flownet=flownet,
                         stereo=stereo, stereo_pose=stereo_pose)

    def depth_net_factory(self, net_name: str) -> nn.Module:
        activation = activation_factory(self.depth_activation)
        if net_name == "DepthNetBasic":
            return dn.DepthNetBasic(activation, self.upsample_interp,
                                    dtype=self.dtype)
        if net_name == "DepthNetNoResize":
            return dn.DepthNetNoResize(activation, self.upsample_interp,
                                       dtype=self.dtype)
        if net_name in BACKBONE_NAMES:
            backbone = backbone_factory(net_name, self.dtype)
            if self.remat_backbone:
                cls = type(backbone)
                kwargs = {f.name: getattr(backbone, f.name)
                          for f in backbone.__dataclass_fields__.values()
                          if f.name not in ("parent", "name")}
                # `train` is a static python bool inside BatchNorm branches
                backbone = nn.remat(cls, static_argnums=(2,))(**kwargs)
            import jax

            # space-to-depth fine-scale decoder: TPU lane-padding fix
            # (exact math, same params; see layers.PackedConv2D). CPU
            # keeps the plain path -- packed is slower there.
            packed_tail = jax.default_backend() not in ("cpu",)
            return dn.DepthNetPretrained(backbone, activation,
                                         self.upsample_interp,
                                         dtype=self.dtype,
                                         packed_tail=packed_tail)
        raise ValueError(f"wrong depth net name: {net_name}")

    def pose_net_factory(self, net_name: str) -> nn.Module:
        if net_name == "PoseNetBasic":
            return pn.PoseNetBasic(self.high_res, dtype=self.dtype)
        if net_name == "PoseNetImproved":
            return pn.PoseNetImproved(self.high_res, dtype=self.dtype)
        if net_name == "PoseNetDeep":
            return pn.PoseNetDeep(self.high_res, dtype=self.dtype)
        if net_name in BACKBONE_NAMES:
            backbone = backbone_factory(net_name, self.dtype)
            return pn.PoseNetPreTrained(backbone, self.high_res,
                                        dtype=self.dtype)
        raise ValueError(f"wrong pose net name: {net_name}")

    def flow_net_factory(self, net_name: str) -> nn.Module:
        if net_name == "PWCNet":
            import jax

            from xpt_mde_tpu.models.flow_net import PWCNet
            on_tpu = jax.default_backend() not in ("cpu",)
            # packed encoder: same lane-padding fix as the depth
            # decoder's packed_tail; exact math, CPU keeps plain
            return PWCNet(dtype=self.dtype, use_pallas=on_tpu,
                          packed_encoder=on_tpu)
        raise ValueError(f"wrong flow net name: {net_name}")
