"""Typed configuration system: constants, loss recipes, training/test plans.

Re-designs the reference's class-hierarchy config
(/root/reference/config-example.py:16-298) as frozen dataclasses with the
same constants and plan semantics, but: no import-time filesystem asserts,
no mutable global singleton requirement (a default ``opts`` is provided for
convenience), and JSON-serializable plans for checkpoint drift checks.

Key reproduced constants (reference line refs):
- SNIPPET_LEN=5, MIN/MAX_DEPTH (config-example.py:22-24)
- per-dataset image sizes, low & high res (:25-37)
- SSIM_RATIO=0.5, SMOOTHNESS_FACTOR=20, IMAGE_GRADIENT_FACTOR=4 (:67-69)
- scale weights T1/T2 (:70-71); loss recipes (:76-120); plans (:128-173)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import numpy as np

# ---------------------------------------------------------------------------
# fixed data / loss constants

SNIPPET_LEN = 5
NUM_SRC = SNIPPET_LEN - 1
MIN_DEPTH = 1e-3
MAX_DEPTH = 80.0

IMAGE_SIZES_SMALL = {
    "kitti_raw": (128, 512),
    "kitti_odom": (128, 512),
    "cityscapes": (192, 512),
    "waymo": (256, 384),
    "a2d2": (192, 384),
    "driving_stereo": (128, 512),
    "synthetic": (128, 384),
}
IMAGE_SIZES_LARGE = {
    "kitti_raw": (256, 1024),
    "kitti_odom": (256, 1024),
    "cityscapes": (384, 1024),
    "waymo": (512, 768),
    "a2d2": (384, 768),
    "driving_stereo": (256, 1024),
    "synthetic": (256, 768),
}

IMAGE_GRADIENT_FACTOR = 4.0
SMOOTHNESS_FACTOR = 20.0
SSIM_RATIO = 0.5
SCALE_WEIGHT_T1 = tuple(np.array([0.25, 0.25, 0.25, 0.25]) * 4.0)
SCALE_WEIGHT_T2 = tuple(np.array([0.1, 0.2, 0.3, 0.4]) * 4.0)

# ---------------------------------------------------------------------------
# loss recipes (name -> weight); names match the loss registry in
# xpt_mde_tpu/losses (reference: config-example.py:76-120)

LOSS_RIGID_T1 = {
    "L1": 1.0 - SSIM_RATIO, "L1_R": 1.0 - SSIM_RATIO,
    "SSIM": SSIM_RATIO, "SSIM_R": SSIM_RATIO,
    "smoothe": 1.0, "smoothe_R": 1.0,
    "stereoL1": 0.01, "stereoSSIM": 0.01,
    "stereoPose": 1.0,
}
LOSS_RIGID_T2 = {
    "L1": 1.0 - SSIM_RATIO, "L1_R": 1.0 - SSIM_RATIO,
    "SSIM": SSIM_RATIO, "SSIM_R": SSIM_RATIO,
    "smoothe": SMOOTHNESS_FACTOR, "smoothe_R": SMOOTHNESS_FACTOR,
    "stereoL1": 1.0 - SSIM_RATIO, "stereoSSIM": SSIM_RATIO,
    "stereoPose": 1.0,
}
LOSS_RIGID_COMB = {
    "cmbL1": (1.0 - SSIM_RATIO) * 10, "cmbL1_R": (1.0 - SSIM_RATIO) * 10,
    "cmbSSIM": SSIM_RATIO, "cmbSSIM_R": SSIM_RATIO,
    "smoothe": SMOOTHNESS_FACTOR, "smoothe_R": SMOOTHNESS_FACTOR,
    "stereoL1": 1.0 - SSIM_RATIO, "stereoSSIM": SSIM_RATIO,
    "stereoPose": 1.0,
}
LOSS_RIGID_MOA = {
    "moaL1": (1.0 - SSIM_RATIO) * 10, "moaL1_R": (1.0 - SSIM_RATIO) * 10,
    "moaSSIM": SSIM_RATIO, "moaSSIM_R": SSIM_RATIO,
    "smoothe": SMOOTHNESS_FACTOR, "smoothe_R": SMOOTHNESS_FACTOR,
    "stereoPose": 1.0,
}
LOSS_RIGID_MOA_WST = {
    **LOSS_RIGID_MOA,
    "stereoL1": 1.0 - SSIM_RATIO, "stereoSSIM": SSIM_RATIO,
}
LOSS_RIGID_MD2 = {
    "md2L1": 1.0 - SSIM_RATIO, "md2L1_R": 1.0 - SSIM_RATIO,
    "md2SSIM": SSIM_RATIO, "md2SSIM_R": SSIM_RATIO,
    "smoothe": 1.0, "smoothe_R": 1.0,
    "stereoL1": 1.0 - SSIM_RATIO, "stereoSSIM": SSIM_RATIO,
    "stereoPose": 1.0,
}
LOSS_FLOW = {"flowL2": 1.0, "flowL2_R": 1.0, "flow_reg": 4e-7}

# ---------------------------------------------------------------------------
# net-name groups (reference: config-example.py:51-58)

JOINT_NET = {"depth": "EfficientNetB5", "camera": "PoseNetImproved", "flow": "PWCNet"}
RIGID_NET = {"depth": JOINT_NET["depth"], "camera": JOINT_NET["camera"]}
FLOW_NET = {"flow": "PWCNet"}


@dataclass(frozen=True)
class TrainStage:
    """One row of a training plan (reference: config-example.py:128-141)."""

    net_names: Mapping[str, str]
    dataset: str
    epochs: int
    learning_rate: float
    loss_weights: Mapping[str, float]
    scale_weights: Sequence[float]
    save_ckpt: bool = True


@dataclass(frozen=True)
class TestStage:
    """One row of a test plan (reference: config-example.py:223-248)."""

    net_names: Mapping[str, str]
    dataset: str
    out_keys: Sequence[str]
    ckpt_name: str
    weight_suffix: str = "latest"


def training_plan_28(loss_pretrain=LOSS_RIGID_T2, loss_finetune=LOSS_RIGID_COMB,
                     fine_tune_net=JOINT_NET) -> list[TrainStage]:
    """The headline multi-dataset pretraining plan (config-example.py:128-141)."""
    sw = SCALE_WEIGHT_T1
    return [
        TrainStage(RIGID_NET, "kitti_raw", 5, 1e-5, LOSS_RIGID_T1, sw),
        TrainStage(RIGID_NET, "kitti_raw", 10, 1e-4, loss_pretrain, sw),
        TrainStage(RIGID_NET, "a2d2", 10, 1e-4, loss_pretrain, sw),
        TrainStage(RIGID_NET, "waymo", 10, 1e-4, LOSS_RIGID_T2, sw),
        TrainStage(RIGID_NET, "kitti_odom", 10, 1e-4, loss_pretrain, sw),
        TrainStage(RIGID_NET, "cityscapes", 10, 1e-5, loss_pretrain, sw),
        TrainStage(RIGID_NET, "kitti_raw", 5, 1e-4, loss_pretrain, sw),
        TrainStage(fine_tune_net, "kitti_raw", 10, 1e-4, loss_finetune, sw),
        TrainStage(fine_tune_net, "kitti_raw", 10, 1e-5, loss_finetune, sw),
        TrainStage(fine_tune_net, "kitti_raw", 5, 1e-6, loss_finetune, sw),
    ]


def training_plan_30() -> list[TrainStage]:
    """KITTI-only ablation plan (config-example.py:164-173)."""
    sw = SCALE_WEIGHT_T1
    return [
        TrainStage(RIGID_NET, "kitti_raw", 5, 1e-5, LOSS_RIGID_T1, sw),
        TrainStage(RIGID_NET, "kitti_raw", 10, 1e-4, LOSS_RIGID_T2, sw),
        TrainStage(RIGID_NET, "kitti_raw", 5, 1e-4, LOSS_RIGID_T2, sw),
        TrainStage(JOINT_NET, "kitti_raw", 10, 1e-4, LOSS_RIGID_COMB, sw),
        TrainStage(JOINT_NET, "kitti_raw", 10, 1e-5, LOSS_RIGID_COMB, sw),
        TrainStage(JOINT_NET, "kitti_raw", 5, 1e-6, LOSS_RIGID_COMB, sw),
    ]


@dataclass
class Config:
    """Top-level framework configuration.

    Unlike the reference, paths are plain fields (no import-time asserts)
    and there are no CLI flags -- scripts read a Config, matching the
    reference's zero-flag philosophy (README.md:30-37).
    """

    # data
    stereo: bool = True
    high_res: bool = False
    snippet_len: int = SNIPPET_LEN
    min_depth: float = MIN_DEPTH
    max_depth: float = MAX_DEPTH

    # training
    per_replica_batch: int = 8
    optimizer: str = "adam_constant"
    depth_activation: str = "InverseSigmoid"  # or "Exponential"
    pretrained_weight: bool = True
    compute_dtype: str = "bfloat16"  # MXU-native; "float32" for parity checks
    train_mode: str = "jit"  # "eager" | "jit" | "distributed"
    # full-res warp gather storage: "float32" (parity) or "bfloat16"
    # (halves the packed-patch HBM footprint; measured r2: does NOT
    # change gather time -- the TPU gather costs ~14ns/index regardless)
    warp_gather_dtype: str = "float32"
    # view-synthesis warp backend on TPU: "pallas" (gather-free MXU
    # kernel, int8 one-hot dots at the 2x int8 MXU rate: EXACT for
    # uint8-grid pixel values, <= 1/255 for augmented ones, ~5x the XLA
    # gather), "pallas_bf16" (single bf16 image term, ~2e-3, ~3.5x),
    # "pallas_exact" (3-term bf16 split, ~2e-7, ~1.2x), or "xla"
    # (bit-exact patch gather). Measured: benchmarks/check_pallas_warp_tpu.py
    warp_kernel: str = "pallas"

    # augmentation probabilities (reference: config-example.py:208-210)
    augment_probs: Mapping[str, float] = field(default_factory=lambda: {
        "CropAndResize": 0.2, "HorizontalFlip": 0.2, "ColorJitter": 0.2})

    # nets
    joint_net: Mapping[str, str] = field(default_factory=lambda: dict(JOINT_NET))
    depth_upsample_interp: str = "nearest"

    # paths (set by user scripts)
    datapath: str = "/tmp/xpt_mde_tpu_data"
    ckpt_name: str = "mde01"

    # plan
    training_plan: Sequence[TrainStage] = field(default_factory=training_plan_30)
    test_plan: Sequence[TestStage] = field(default_factory=list)

    # misc
    validation_frames: int = 500
    frames_per_shard: int = 2000
    log_loss: bool = True
    # value-distribution trace 3x/epoch (train_val.py:239-264); costs one
    # extra jitted forward at each inspected step, so off by default
    inspect_model: bool = False
    # dataset conversion: drives build in parallel over a spawn process
    # pool (0/1 = serial, the reference's behavior); per-drive shard
    # dirs are independent so the output is identical either way
    shard_build_workers: int = 0
    # input pipeline: batches assembled on N threads (order-preserving;
    # the delivered stream is identical to 1). One thread feeds one chip
    # with ~2.5x headroom; raise to 4-8 for multi-chip DP hosts
    # (benchmarks/loader_bench.py measures the scaling)
    loader_workers: int = 1
    # predict_by_plan host-memory budget: accumulated predictions flush
    # to part files past this size, so a high-res test split (a few
    # thousand 256x1024 frames of image+depth+gt) never exceeds host
    # RAM (evaluate_main.predict_dataset_chunked)
    predict_flush_mb: int = 2048
    # gradient accumulation: split each batch into N sequential
    # microbatches (lax.scan) with ONE optimizer update -- activation
    # memory drops ~N x, so effective batches beyond HBM (the
    # reference's high-res batch-4 GPU ceiling) fit one chip. Updates
    # are exact up to float addition order; BatchNorm stats update per
    # microbatch (training/train_step.py:make_train_step).
    grad_accum_steps: int = 1
    # preemption safety: checkpoint the full train state every N steps
    # (0 = epoch-end only, the reference's granularity). With N > 0 a
    # killed run resumes mid-epoch at the last saved step, bit-exact:
    # rngs are fold_in(epoch, step) chains and the loader order is a
    # pure function of (seed, epoch), so nothing else needs saving.
    ckpt_every_steps: int = 0

    # parallelism: 1-D data mesh by default; extra axes are hooks for
    # spatial/model sharding if ever needed (SURVEY.md section 2.7)
    mesh_shape: Mapping[str, int] = field(default_factory=lambda: {"data": 1})

    # per-dataset (H, W) overrides on top of the low/high-res tables
    image_size_overrides: Mapping[str, tuple] = field(default_factory=dict)

    @property
    def image_sizes(self) -> Mapping[str, tuple[int, int]]:
        base = IMAGE_SIZES_LARGE if self.high_res else IMAGE_SIZES_SMALL
        if not self.image_size_overrides:
            return base
        merged = dict(base)
        merged.update({k: tuple(v) for k, v in self.image_size_overrides.items()})
        return merged

    @property
    def batch_size(self) -> int:
        ndev = 1
        for n in self.mesh_shape.values():
            ndev *= n
        return self.per_replica_batch * ndev

    def get_img_shape(self, code: str = "HW", dataset: str = "kitti_raw",
                      scale_div: int = 1):
        """Shape helper with the reference's shape codes
        (config-example.py:272-294): H/W/HW/WH/HWC/SHW/SHWC/BSHWC/RSHWC."""
        h, w = self.image_sizes[dataset]
        h, w = h // scale_div, w // scale_div
        s, b, r = self.snippet_len, self.batch_size, self.per_replica_batch
        codes = {
            "H": h, "W": w, "HW": (h, w), "WH": (w, h), "HWC": (h, w, 3),
            "SHW": (s, h, w), "SHWC": (s, h, w, 3),
            "BSHWC": (b, s, h, w, 3), "RSHWC": (r, s, h, w, 3),
        }
        if code not in codes:
            raise ValueError(f"Invalid shape code: {code}")
        return codes[code]

    # sub-paths mirroring the reference directory layout
    @property
    def datapath_src(self): return f"{self.datapath}/srcdata"
    @property
    def datapath_shd(self): return f"{self.datapath}/shards"
    @property
    def datapath_ckp(self): return f"{self.datapath}/checkpts"
    @property
    def datapath_log(self): return f"{self.datapath}/log"
    @property
    def datapath_prd(self): return f"{self.datapath}/prediction"
    @property
    def datapath_evl(self): return f"{self.datapath}/evaluation"

    def to_json_dict(self) -> dict[str, Any]:
        """JSON-serializable snapshot used for config-drift checks on resume
        (reference: model/model_util/logger.py:256-287)."""
        def convert(v):
            if isinstance(v, (list, tuple)):
                return [convert(x) for x in v]
            if dataclasses.is_dataclass(v):
                return {k: convert(getattr(v, k)) for k in
                        (f.name for f in dataclasses.fields(v))}
            if isinstance(v, Mapping):
                return {k: convert(x) for k, x in v.items()}
            if isinstance(v, np.floating):
                return float(v)
            if isinstance(v, np.integer):
                return int(v)
            return v
        return {f.name: convert(getattr(self, f.name))
                for f in dataclasses.fields(self)}


# convenience default; scripts may build their own Config instead
opts = Config()
