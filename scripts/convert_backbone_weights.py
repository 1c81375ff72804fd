"""Offline tool: convert keras ImageNet backbone weights to native format.

Run on a machine with the keras weights available (downloaded or local
h5); the output msgpack initializes DepthNetPretrained backbones when
``cfg.pretrained_weight`` is set (the reference's PRETRAINED_WEIGHT=True
behavior, config-example.py:46).

    python scripts/convert_backbone_weights.py EfficientNetB5 /data/xpt_mde_tpu

writes /data/xpt_mde_tpu/pretrained/EfficientNetB5.msgpack. Supports the
full zoo (EfficientNetB0-B7, ResNet50V2, DenseNet121, MobileNetV2,
VGG16, Xception, NASNetMobile, NASNetLarge).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert(net_name: str, datapath: str, weights: str = "imagenet"):
    import flax
    import tensorflow as tf

    from xpt_mde_tpu.models.backbones import BACKBONE_NAMES
    from xpt_mde_tpu.models.backbones.convert_keras import convert_backbone

    if net_name not in BACKBONE_NAMES:
        raise ValueError(f"unknown backbone {net_name}; one of {BACKBONE_NAMES}")
    builder = getattr(tf.keras.applications, net_name)
    # weight layout is spatial-size independent; keras default sizes are fine
    keras_model = builder(include_top=False, weights=weights)
    params, stats = convert_backbone(keras_model, net_name)

    out_dir = Path(datapath) / "pretrained"
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f"{net_name}.msgpack"
    out.write_bytes(flax.serialization.to_bytes(
        {"params": params, "batch_stats": stats}))
    print(f"[convert_backbone_weights] wrote {out}")
    return out


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2],
            sys.argv[3] if len(sys.argv) > 3 else "imagenet")
