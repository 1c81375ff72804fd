"""ImageNet-backbone zoo producing 5 multi-scale feature maps (strides
2, 4, 8, 16, 32), the encode contract of the reference's PretrainedModel
(/root/reference/model/build_model/pretrained_nets.py:16-117 +
scaled_layers.json tap points).

All backbones are native Flax implementations (no downloads); converted
ImageNet weights can be loaded through the checkpoint system when
available offline.
"""

from xpt_mde_tpu.models.backbones.efficientnet import EfficientNet
from xpt_mde_tpu.models.backbones.resnet import ResNet50V2
from xpt_mde_tpu.models.backbones.mobilenet import MobileNetV2
from xpt_mde_tpu.models.backbones.vgg import VGG16
from xpt_mde_tpu.models.backbones.densenet import DenseNet121
from xpt_mde_tpu.models.backbones.xception import Xception
from xpt_mde_tpu.models.backbones.nasnet import NASNet


def backbone_factory(net_name: str, dtype):
    """Build a backbone module by reference net name."""
    if net_name.startswith("EfficientNetB"):
        return EfficientNet(variant=net_name[-2:], dtype=dtype)
    if net_name == "ResNet50V2":
        return ResNet50V2(dtype=dtype)
    if net_name == "MobileNetV2":
        return MobileNetV2(dtype=dtype)
    if net_name == "VGG16":
        return VGG16(dtype=dtype)
    if net_name == "DenseNet121":
        return DenseNet121(dtype=dtype)
    if net_name == "Xception":
        return Xception(dtype=dtype)
    if net_name in ("NASNetMobile", "NASNetLarge"):
        return NASNet(variant=net_name[6:], dtype=dtype)
    raise ValueError(f"unknown backbone: {net_name}")


BACKBONE_NAMES = ["EfficientNetB0", "EfficientNetB1", "EfficientNetB2",
                  "EfficientNetB3", "EfficientNetB4", "EfficientNetB5",
                  "EfficientNetB6", "EfficientNetB7",
                  "ResNet50V2", "MobileNetV2", "VGG16",
                  "DenseNet121", "Xception", "NASNetMobile", "NASNetLarge"]
