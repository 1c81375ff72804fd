"""Convert keras EfficientNet weights into the Flax backbone param tree.

The reference gets ImageNet initialization from tf.keras.applications
(/root/reference/model/build_model/pretrained_nets.py); this environment
has no network egress, but the converter lets any offline keras weight
file (or a built keras model) initialize our native backbones --
"pretrained backbone parity" is SURVEY.md hard part #3.

Verified by tests/test_keras_conversion.py: a randomly initialized keras
EfficientNetB0 and our Flax EfficientNet produce matching feature maps
after conversion (keras builds architectures without downloading).

Layout notes:
- keras Conv2D kernels are [kh, kw, in, out] == flax;
- keras DepthwiseConv2D kernels are [kh, kw, C, 1] -> flax grouped-conv
  [kh, kw, 1, C];
- keras BN (gamma, beta, moving_mean, moving_variance) -> flax
  (scale, bias) params + (mean, var) batch_stats;
- keras EfficientNet pads explicitly (ZeroPadding2D + valid conv), which
  equals XLA SAME padding for even input sizes (all sizes here are /32
  divisible).
"""

from __future__ import annotations

import numpy as np

_BLOCK_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _keras_weight_dict(keras_model) -> dict:
    """{layer_name: {short_weight_name: array}} -- robust across keras 2
    (prefixed weight names) and keras 3 (bare names)."""
    out = {}
    for layer in keras_model.layers:
        weights = {}
        for weight in layer.weights:
            short = weight.name.split("/")[-1].split(":")[0]
            weights[short] = np.asarray(weight)
        if weights:
            out[layer.name] = weights
    return out


def _bn(kw: dict, name: str):
    layer = kw[name]
    params = {"scale": layer["gamma"], "bias": layer["beta"]}
    stats = {"mean": layer["moving_mean"], "var": layer["moving_variance"]}
    return params, stats


def _conv(kw: dict, name: str, depthwise: bool = False, bias: bool = False):
    layer = kw[name]
    key = "depthwise_kernel" if ("depthwise_kernel" in layer) else "kernel"
    kernel = layer[key]
    if depthwise and kernel.shape[-1] == 1:  # [kh,kw,C,1] -> [kh,kw,1,C]
        kernel = np.transpose(kernel, (0, 1, 3, 2))
    out = {"kernel": kernel}
    if bias:
        out["bias"] = layer["bias"]
    return out


def convert_efficientnet(keras_model, variant: str = "B0"):
    """keras EfficientNet -> (params, batch_stats) for our EfficientNet.

    :param keras_model: a tf.keras.applications.EfficientNetBx instance
        (include_top irrelevant; weights may be None or 'imagenet')
    :return: (params, batch_stats) dicts shaped like
        EfficientNet(variant).init(...)['params' / 'batch_stats']
    """
    kw = _keras_weight_dict(keras_model)

    # input normalization: keras Rescaling(1/255) + Normalization
    # (+ imagenet-only Rescaling(1/sqrt(std)), folded into the variance:
    # ((x-m)/sqrt(v))*r == (x-m)/sqrt(v/r^2)) -- keras efficientnet.py:325-338
    mean = np.zeros(3, np.float32)
    var = np.ones(3, np.float32)
    for layer in keras_model.layers:
        cls = type(layer).__name__
        if cls == "Normalization" and layer.weights:
            w = {v.name.split("/")[-1].split(":")[0]: np.asarray(v)
                 for v in layer.weights}
            mean = w["mean"].reshape(3).astype(np.float32)
            var = w["variance"].reshape(3).astype(np.float32)
        elif cls == "Rescaling":
            scale = np.asarray(layer.get_config()["scale"], np.float32)
            if scale.ndim == 0 and np.isclose(scale, 1.0 / 255.0):
                continue  # the standard 0-255 rescale our module applies
            var = var / scale.reshape(3) ** 2
    return convert_efficientnet_kw(kw, variant, mean, var)


def convert_efficientnet_kw(kw: dict, variant: str = "B0",
                            input_mean=None, input_var=None):
    """Weight-dict variant of convert_efficientnet, for checkpoints read
    straight from a keras H5 file (training/import_reference.py) where no
    model object exists. ``kw`` is {layer_name: {short_weight_name: arr}}.

    Input normalization falls back to the H5's "normalization" layer
    weights when present (the TF-2.4 keras EfficientNet saves its
    preprocessing Normalization's mean/variance/count)."""
    params: dict = {}
    stats: dict = {}

    if input_mean is None:
        norm = kw.get("normalization", {})
        input_mean = norm.get("mean", np.zeros(3)).reshape(3).astype(np.float32)
        input_var = norm.get("variance", np.ones(3)).reshape(3).astype(np.float32)
    stats["input_mean"] = np.asarray(input_mean, np.float32).reshape(3)
    stats["input_var"] = np.asarray(input_var, np.float32).reshape(3)

    from xpt_mde_tpu.models.backbones.efficientnet import (_B0_STAGES,
                                                           _SCALING,
                                                           round_repeats)

    # stem
    params["Conv_0"] = _conv(kw, "stem_conv")
    p, s = _bn(kw, "stem_bn")
    params["BatchNorm_0"] = p
    stats["BatchNorm_0"] = s

    _, depth_mult = _SCALING[variant]
    mb_idx = 0
    for stage_idx, (expand, ch, reps, stride, kernel) in enumerate(_B0_STAGES):
        for rep in range(round_repeats(reps, depth_mult)):
            prefix = f"block{stage_idx + 1}{_BLOCK_LETTERS[rep]}"
            mb_params: dict = {}
            mb_stats: dict = {}
            conv_i = bn_i = 0
            if expand != 1:
                mb_params[f"Conv_{conv_i}"] = _conv(kw, f"{prefix}_expand_conv")
                p, s = _bn(kw, f"{prefix}_expand_bn")
                mb_params[f"BatchNorm_{bn_i}"] = p
                mb_stats[f"BatchNorm_{bn_i}"] = s
                conv_i += 1
                bn_i += 1
            mb_params[f"Conv_{conv_i}"] = _conv(kw, f"{prefix}_dwconv",
                                                depthwise=True)
            p, s = _bn(kw, f"{prefix}_bn")
            mb_params[f"BatchNorm_{bn_i}"] = p
            mb_stats[f"BatchNorm_{bn_i}"] = s
            conv_i += 1
            bn_i += 1
            mb_params["SqueezeExcite_0"] = {
                "Conv_0": _conv(kw, f"{prefix}_se_reduce", bias=True),
                "Conv_1": _conv(kw, f"{prefix}_se_expand", bias=True),
            }
            mb_params[f"Conv_{conv_i}"] = _conv(kw, f"{prefix}_project_conv")
            p, s = _bn(kw, f"{prefix}_project_bn")
            mb_params[f"BatchNorm_{bn_i}"] = p
            mb_stats[f"BatchNorm_{bn_i}"] = s

            params[f"MBConv_{mb_idx}"] = mb_params
            stats[f"MBConv_{mb_idx}"] = mb_stats
            mb_idx += 1

    return params, stats


def _autoname_map(layer_names) -> dict:
    """Map keras auto-named layers (conv2d, conv2d_1, batch_normalization_3,
    ...) to deterministic names by encounter order. The numeric suffixes
    depend on a process-global keras layer counter, so they cannot be used
    as stable identifiers; encounter order within the model can.

    Used for Xception's residual 1x1 convs + BNs, which keras leaves
    unnamed -> our modules call them xres_conv_{i} / xres_bn_{i}.

    :param layer_names: layer names in model order (model.layers or the
        H5 file's layer_names attribute)
    """
    import re

    mapping = {}
    conv_i = bn_i = 0
    for name in layer_names:
        if re.fullmatch(r"conv2d(_\d+)?", name):
            mapping[name] = f"xres_conv_{conv_i}"
            conv_i += 1
        elif re.fullmatch(r"batch_normalization(_\d+)?", name):
            mapping[name] = f"xres_bn_{bn_i}"
            bn_i += 1
    return mapping


def convert_keras_by_name(keras_model):
    """Generic keras -> Flax conversion for flat keras-named backbones
    (ResNet50V2, DenseNet121, MobileNetV2, VGG16, Xception).

    Our Flax twins name every Conv/BatchNorm submodule exactly like the
    keras layer (with "/" -> "_", keras-2.4 DenseNet style), so the
    conversion is a mechanical walk: Conv2D/DepthwiseConv2D -> kernel
    (+bias), SeparableConv2D -> {name}_dw + {name}_pw, BatchNorm ->
    (scale, bias) params + (mean, var) batch_stats.

    :return: (params, batch_stats) dicts for load_into_variables.
    """
    kw = _keras_weight_dict(keras_model)
    # keras 3 names DepthwiseConv2D kernels plain "kernel"; detect by class
    depthwise_layers = {l.name for l in keras_model.layers
                        if type(l).__name__ == "DepthwiseConv2D"}
    return convert_keras_by_name_kw(kw, [l.name for l in keras_model.layers],
                                    depthwise_layers)


def convert_keras_by_name_kw(kw: dict, layer_order, depthwise_layers=()):
    """Weight-dict variant of convert_keras_by_name (see
    training/import_reference.py). TF-2.4 H5 files name depthwise kernels
    "depthwise_kernel", so ``depthwise_layers`` is only needed for keras-3
    model objects whose depthwise kernels are saved as plain "kernel"."""
    rename = _autoname_map(layer_order)
    params: dict = {}
    stats: dict = {}
    for lname, w in kw.items():
        name = rename.get(lname, lname).replace("/", "_")
        if lname in depthwise_layers and "depthwise_kernel" not in w:
            w = dict(w)
            w["depthwise_kernel"] = w.pop("kernel")
        if "moving_mean" in w:
            p = {}
            if "gamma" in w:
                p["scale"] = w["gamma"]
            if "beta" in w:
                p["bias"] = w["beta"]
            params[name] = p
            stats[name] = {"mean": w["moving_mean"],
                           "var": w["moving_variance"]}
        elif "depthwise_kernel" in w and "pointwise_kernel" in w:
            # SeparableConv2D -> two grouped/pointwise Flax convs
            dw = np.transpose(w["depthwise_kernel"], (0, 1, 3, 2))
            params[name + "_dw"] = {"kernel": dw}
            pw = {"kernel": w["pointwise_kernel"]}
            if "bias" in w:
                pw["bias"] = w["bias"]
            params[name + "_pw"] = pw
        elif "depthwise_kernel" in w:
            dw = np.transpose(w["depthwise_kernel"], (0, 1, 3, 2))
            p = {"kernel": dw}
            if "bias" in w:
                p["bias"] = w["bias"]
            params[name] = p
        elif "kernel" in w:
            p = {"kernel": w["kernel"]}
            if "bias" in w:
                p["bias"] = w["bias"]
            params[name] = p
    return params, stats


def convert_backbone(keras_model, net_name: str):
    """Dispatch: EfficientNet keeps its structured converter; the flat
    keras-named twins use the generic name-based walk."""
    if net_name.startswith("EfficientNetB"):
        return convert_efficientnet(keras_model, net_name[-2:])
    return convert_keras_by_name(keras_model)


def convert_backbone_kw(kw: dict, layer_order, net_name: str):
    """convert_backbone over a raw weight dict (H5-file import path,
    training/import_reference.py) -- no keras model object needed."""
    if net_name.startswith("EfficientNetB"):
        return convert_efficientnet_kw(kw, net_name[-2:])
    return convert_keras_by_name_kw(kw, layer_order)


def load_into_variables(variables, params, batch_stats):
    """Graft converted (params, batch_stats) into an init()'d variables
    tree, asserting shape agreement leaf by leaf."""
    import jax

    def merge(dst, src, path=""):
        out = dict(dst)
        for key, val in src.items():
            if key not in dst:
                raise KeyError(f"converted key missing in model: {path}/{key}")
            if isinstance(val, dict):
                out[key] = merge(dst[key], val, f"{path}/{key}")
            else:
                if tuple(dst[key].shape) != tuple(val.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{key}: "
                        f"{dst[key].shape} vs {val.shape}")
                out[key] = jax.numpy.asarray(val, dst[key].dtype)
        return out

    new_vars = dict(variables)
    new_vars["params"] = merge(variables["params"], params)
    if batch_stats and "batch_stats" in variables:
        new_vars["batch_stats"] = merge(variables["batch_stats"], batch_stats)
    return new_vars
