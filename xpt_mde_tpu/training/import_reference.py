"""Import reference (goodgodgd/xpt-mde-2021) keras H5 checkpoints.

The reference saves each sub-net with ``keras.Model.save_weights(...h5)``
(/root/reference/model/build_model/model_wrappers.py:101-117) into
``{depthnet,posenet,flownet}_{suffix}.h5``. Every weighted layer carries
an explicit name there (``vo_conv*`` pose_net.py, ``dp_*`` depth_net.py,
``pwc_*`` flow_net.py), so the mapping into our Flax param trees is
deterministic by name. This module reads those H5 files with h5py alone
(no TensorFlow needed) and rebuilds the matching per-net msgpack
checkpoints (training/checkpoint.py layout) -- a reference user's trained
models carry over directly instead of retraining.

Weight-layout notes:
- keras Conv2D kernels are [kh, kw, in, out] == flax nn.Conv;
- keras Conv2DTranspose kernels are [kh, kw, out, in] and the layer
  computes the *gradient-of-conv* transpose; flax nn.ConvTranspose is a
  fractionally strided conv (``transpose_kernel=False``), so the kernel
  converts by spatial flip + in/out swap (pinned numerically against
  tf.keras in tests/test_import_reference.py);
- backbone weights inside a DepthNetPretrained H5 keep their
  keras-applications layer names -> reuse backbones/convert_keras.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

NETS = ("depthnet", "posenet", "flownet")


# --------------------------------------------------------------------------
# keras legacy-H5 reading (the TF-2.x save_weights wire format)

def read_keras_h5(path):
    """Read a keras legacy save_weights H5 file.

    :return: (layer_order, kw) where ``kw`` maps each weighted layer name
        to {short_weight_name: np.ndarray} and ``layer_order`` lists those
        names in model (creation) order. Nested sub-models (e.g. the
        keras-applications backbone inside DepthNetPretrained) are
        flattened: the sub-layer name is the second-to-last component of
        the saved weight path.
    """
    import h5py

    def _dec(value):
        return value.decode() if isinstance(value, bytes) else str(value)

    layer_order: list = []
    kw: dict = {}
    with h5py.File(path, "r") as f:
        group = f["model_weights"] if "model_weights" in f else f
        top_names = [_dec(n) for n in group.attrs["layer_names"]]
        for top in top_names:
            grp = group[top]
            weight_names = [_dec(n) for n in grp.attrs.get("weight_names", [])]
            for wname in weight_names:
                parts = wname.split("/")
                short = parts[-1].split(":")[0]
                layer = parts[-2] if len(parts) >= 2 else top
                if layer not in kw:
                    kw[layer] = {}
                    layer_order.append(layer)
                kw[layer][short] = np.asarray(grp[wname])
    return layer_order, kw


# --------------------------------------------------------------------------
# per-layer converters

def _conv(kw: dict, name: str) -> dict:
    """Named keras Conv2D -> our Conv module subtree ({Conv_0: {...}},
    models/layers.py Conv wraps one nn.Conv auto-named Conv_0)."""
    if name not in kw:
        raise KeyError(f"layer '{name}' missing from the H5 file")
    w = kw[name]
    leaf = {"kernel": w["kernel"]}
    if "bias" in w:
        leaf["bias"] = w["bias"]
    return {"Conv_0": leaf}


def deconv_kernel(kernel_tf: np.ndarray) -> np.ndarray:
    """keras Conv2DTranspose kernel [kh, kw, out, in] -> flax
    nn.ConvTranspose kernel [kh, kw, in, out].

    tf.nn.conv2d_transpose is the gradient of conv2d (spatially flipped
    correlation); lax.conv_transpose(transpose_kernel=False), which flax
    uses, is a plain fractionally-strided convolution -- equal after a
    spatial flip and an in/out axis swap."""
    return np.flip(kernel_tf, axis=(0, 1)).transpose(0, 1, 3, 2)


def _deconv(kw: dict, name: str) -> dict:
    w = kw[name]
    leaf = {"kernel": deconv_kernel(w["kernel"])}
    if "bias" in w:
        leaf["bias"] = w["bias"]
    return leaf


# --------------------------------------------------------------------------
# posenet

_POSE_ORDERS = {
    # pose_net.py:16-33
    "PoseNetBasic": ["vo_conv1", "vo_conv2", "vo_conv3", "vo_conv4",
                     "vo_conv5", "vo_conv6", "vo_conv7"],
    # pose_net.py:57-91
    "PoseNetImproved": ["vo_conv1", "vo_conv2", "vo_conv3", "vo_conv4",
                        "vo_conv5", "vo_conv6_1", "vo_conv6_2", "vo_conv6_3"],
    # pose_net.py:94-133
    "PoseNetDeep": ["vo_conv0", "vo_conv1_1", "vo_conv1_2",
                    "vo_conv2_1", "vo_conv2_2", "vo_conv2_3",
                    "vo_conv3_1", "vo_conv3_2", "vo_conv3_3",
                    "vo_conv4_1", "vo_conv4_2", "vo_conv4_3",
                    "vo_conv5_1", "vo_conv5_2", "vo_conv5_3",
                    "vo_conv6_1", "vo_conv6_2", "vo_conv6_3"],
}


def posenet_params(kw: dict, variant: str = "PoseNetImproved",
                   high_res: bool = False) -> dict:
    """H5 weights -> params subtree for models/pose_net.py modules."""
    if variant not in _POSE_ORDERS:
        raise ValueError(f"unsupported posenet variant: {variant}")
    names = list(_POSE_ORDERS[variant])
    if high_res and variant != "PoseNetBasic":  # pose_net.py:80-84
        names += ["vo_conv7_1", "vo_conv7_2", "vo_conv7_3"]
    names.append("vo_conv8" if variant == "PoseNetBasic" else "vo_conv_last")
    return {f"Conv_{i}": _conv(kw, n) for i, n in enumerate(names)}


# --------------------------------------------------------------------------
# depthnet

def _upconv_block(kw: dict, scope: str) -> dict:
    """dp_up{N}_conv1/_conv2 -> UpconvBlock (depth_net.py:76-85)."""
    return {"Conv_0": _conv(kw, scope + "_conv1"),
            "Conv_1": _conv(kw, scope + "_conv2")}


def _depth_head(kw: dict, scope: str) -> dict:
    """dp_depth{N}_conv -> ScaledDepthHead (depth_net.py:87-91)."""
    return {"Conv_0": _conv(kw, scope + "_conv")}


def _decoder_params(kw: dict) -> dict:
    """The shared 4-head decoder (depth_net.py:57-64 / :137-167); module
    order in models/depth_net.py DepthDecoder."""
    return {
        "UpconvBlock_0": _upconv_block(kw, "dp_up4"),
        "UpconvBlock_1": _upconv_block(kw, "dp_up3"),
        "ScaledDepthHead_0": _depth_head(kw, "dp_depth3"),
        "UpconvBlock_2": _upconv_block(kw, "dp_up2"),
        "ScaledDepthHead_1": _depth_head(kw, "dp_depth2"),
        "UpconvBlock_3": _upconv_block(kw, "dp_up1"),
        "ScaledDepthHead_2": _depth_head(kw, "dp_depth1"),
        "UpconvBlock_4": _upconv_block(kw, "dp_up0"),
        "ScaledDepthHead_3": _depth_head(kw, "dp_depth0"),
    }


_BASIC_ENCODER = ["dp_conv0b", "dp_conv1a", "dp_conv1b", "dp_conv2a",
                  "dp_conv2b", "dp_conv3a", "dp_conv3b", "dp_conv4a",
                  "dp_conv4b", "dp_conv5a", "dp_conv5b", "dp_conv6a",
                  "dp_conv6b", "dp_conv7a"]  # depth_net.py:39-52


def depthnet_params(kw: dict, layer_order, variant: str):
    """H5 weights -> (params, batch_stats) for models/depth_net.py.

    ``variant`` is the net name from the plan row: DepthNetBasic /
    DepthNetNoResize / a backbone name (DepthNetPretrained)."""
    if variant in ("DepthNetBasic", "DepthNetNoResize"):
        encoder = {f"Conv_{i}": _conv(kw, n)
                   for i, n in enumerate(_BASIC_ENCODER)}
        params = {"BasicEncoder_0": encoder,
                  "UpconvBlock_0": _upconv_block(kw, "dp_up6"),
                  "UpconvBlock_1": _upconv_block(kw, "dp_up5"),
                  "DepthDecoder_0": _decoder_params(kw)}
        return params, {}

    # DepthNetPretrained: keras-applications backbone + dp_* decoder
    from xpt_mde_tpu.models.backbones.convert_keras import (
        convert_backbone_kw)
    bb_kw = {k: v for k, v in kw.items() if not k.startswith("dp_")}
    bb_order = [k for k in layer_order if not k.startswith("dp_")]
    bb_params, bb_stats = convert_backbone_kw(bb_kw, bb_order, variant)
    params = {"backbone": bb_params, "DepthDecoder_0": _decoder_params(kw)}
    stats = {"backbone": bb_stats} if bb_stats else {}
    return params, stats


# --------------------------------------------------------------------------
# flownet (PWC-Net)

def _pwc_encoder(kw: dict, suffix: str) -> dict:
    """pwc_conv{1..6}{a,b,c}{suffix} -> PWCEncoder (flow_net.py:65-84)."""
    names = [f"pwc_conv{level}{sub}{suffix}"
             for level in range(1, 7) for sub in "abc"]
    return {f"Conv_{i}": _conv(kw, n) for i, n in enumerate(names)}


def _flow_predictor(kw: dict, prefix: str, dense32_name: str,
                    up: bool) -> dict:
    """pwc_flow{p}_* -> FlowPredictor (flow_net.py:127-147). The
    32-channel dense conv is the reference's one UNNAMED layer
    (flow_net.py:137, keras auto-names it conv2d[_N]); its resolved name
    comes in as ``dense32_name``."""
    params = {"Conv_0": _conv(kw, prefix + "c1"),
              "Conv_1": _conv(kw, prefix + "c2"),
              "Conv_2": _conv(kw, prefix + "c3"),
              "Conv_3": _conv(kw, prefix + "c4"),
              "Conv_4": _conv(kw, dense32_name),
              "Conv_5": _conv(kw, prefix + "out")}
    if up:
        params["ConvTranspose_0"] = _deconv(kw, prefix + "ct1")
        params["ConvTranspose_1"] = _deconv(kw, prefix + "ct2")
    return params


def flownet_params(kw: dict, layer_order) -> dict:
    """H5 weights -> params subtree for models/flow_net.py PWCNet."""
    # the five unnamed 32-ch predictor convs, in creation order
    # flow6 -> flow5 -> flow4 -> flow3 -> flow2 (flow_net.py:36-42)
    unnamed = [n for n in layer_order if re.fullmatch(r"conv2d(_\d+)?", n)]
    if len(unnamed) != 5:
        raise ValueError(
            f"expected 5 auto-named predictor convs, found {unnamed}")
    params = {"encoder_l": _pwc_encoder(kw, "_l"),
              "encoder_r": _pwc_encoder(kw, "_r")}
    prefixes = ["pwc_flow6_", "pwc_flow5_", "pwc_flow4_", "pwc_flow3_",
                "pwc_flow2_"]
    for i, (prefix, d32) in enumerate(zip(prefixes, unnamed)):
        params[f"FlowPredictor_{i}"] = _flow_predictor(
            kw, prefix, d32, up=(i < 4))
    params["ContextNetwork_0"] = {
        f"Conv_{i}": _conv(kw, f"pwc_context_{i + 1}") for i in range(7)}
    return params


# --------------------------------------------------------------------------
# top-level import

def convert_net_h5(path, net: str, net_names: dict, high_res: bool = False):
    """One reference H5 file -> (params, batch_stats) subtrees for the
    matching sub-net of our VodeModel. ``net_names`` is the plan row's
    {"depth": ..., "camera": ..., "flow": ...} dict."""
    layer_order, kw = read_keras_h5(path)
    if net == "posenet":
        return posenet_params(kw, net_names["camera"], high_res), {}
    if net == "depthnet":
        return depthnet_params(kw, layer_order, net_names["depth"])
    if net == "flownet":
        if net_names.get("flow", "PWCNet") != "PWCNet":
            raise ValueError("only PWCNet flow checkpoints are supported")
        return flownet_params(kw, layer_order), {}
    raise ValueError(f"unknown net: {net}")


def import_reference_checkpoint(src_dir, out_dir, cfg, net_names: dict,
                                suffix: str = "latest",
                                dataset: str = "kitti_raw") -> list:
    """Convert a reference checkpoint directory (``{net}_{suffix}.h5``
    files) into this framework's per-net msgpack checkpoints.

    The target model is initialized from ``cfg``/``net_names`` exactly as
    training would build it, the converted trees are grafted with
    leaf-by-leaf shape checks, and ``{net}_{suffix}.msgpack`` (+
    ``batchstats_{suffix}.msgpack`` when the model tracks batch stats)
    are written to ``out_dir`` in training/checkpoint.py layout.

    :return: list of imported net names
    """
    import flax
    import jax
    import jax.numpy as jnp

    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.models.backbones.convert_keras import (
        load_into_variables)
    from xpt_mde_tpu.training.checkpoint import _write_atomic

    src_dir, out_dir = Path(src_dir), Path(out_dir)
    available = {net: src_dir / f"{net}_{suffix}.h5" for net in NETS
                 if (src_dir / f"{net}_{suffix}.h5").is_file()}
    if not available:
        raise FileNotFoundError(
            f"no {{net}}_{suffix}.h5 files under {src_dir}")

    # init the model the way StageRuntime does, with a dummy batch
    shape = cfg.get_img_shape("SHWC", dataset)
    features = {"image5d": jnp.zeros((1,) + tuple(shape), jnp.float32)}
    dataset_keys = {"image"}
    factory = ModelFactory(dataset_keys, net_names, cfg.depth_activation,
                           stereo=False, high_res=cfg.high_res,
                           upsample_interp=cfg.depth_upsample_interp)
    model = factory.get_model()
    variables = model.init(jax.random.PRNGKey(0), features, train=False)
    params = flax.core.unfreeze(variables["params"]) \
        if isinstance(variables["params"], flax.core.FrozenDict) \
        else dict(variables["params"])
    batch_stats = variables.get("batch_stats")

    out_dir.mkdir(parents=True, exist_ok=True)
    imported = []
    stats_updated = False
    for net, h5_path in available.items():
        if net not in params:
            print(f"[import] {net} in checkpoint but not in net_names; "
                  "skipped")
            continue
        net_params, net_stats = convert_net_h5(h5_path, net, net_names,
                                               cfg.high_res)
        target = {"params": params[net]}
        if batch_stats is not None and net in batch_stats:
            target["batch_stats"] = batch_stats[net]
        merged = load_into_variables(target, net_params, net_stats)
        params[net] = merged["params"]
        _write_atomic(out_dir / f"{net}_{suffix}.msgpack",
                      flax.serialization.to_bytes(merged["params"]))
        if "batch_stats" in merged and net_stats:
            batch_stats = dict(batch_stats)
            batch_stats[net] = merged["batch_stats"]
            stats_updated = True
        imported.append(net)
        print(f"[import] {net}: {h5_path.name} -> "
              f"{net}_{suffix}.msgpack")
    if stats_updated:
        _write_atomic(out_dir / f"batchstats_{suffix}.msgpack",
                      flax.serialization.to_bytes(batch_stats))
    return imported
