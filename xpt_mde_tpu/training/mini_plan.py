"""Miniature TRAINING_PLAN_28: proof the multi-stage system LEARNS.

The reference's pipeline demonstrably trained to AbsRel ~0.105 on KITTI
via the staged plan in /root/reference/config-example.py:125-141 with the
cross-stage per-net weight handoff of model/model_main.py:88-106 (rigid
pre-train -> flow pre-train -> joint fine-tune restoring the flownet from
the flow stage's checkpoint and freezing it). Real datasets are absent in
CI, so this module shrinks that exact mechanic onto the GT-bearing
synthetic renderer (data/synthetic.py, varying_depth): a 3-stage plan
whose net groups CHANGE across rows, driven by the real trainer
(train_by_plan), with held-out depth/pose metrics evaluated through the
real evaluation stack (predict_dataset + Eigen metrics + snippet pose
errors).

Used by tests/test_plan_learns.py (CPU, asserts metrics improve and the
flownet handoff is byte-exact) and benchmarks/check_plan_learns_tpu.py
(same plan on the chip, bfloat16 + Pallas kernels, prints the metric
trajectory).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from xpt_mde_tpu.config import (LOSS_FLOW, SCALE_WEIGHT_T1, Config,
                                TrainStage)

RIGID_NETS = {"depth": "DepthNetBasic", "camera": "PoseNetBasic"}
FLOW_NETS = {"flow": "PWCNet"}
JOINT_NETS = {**RIGID_NETS, **FLOW_NETS}

# smoothness kept small: the synthetic relief has real depth gradients
RECIPE_RIGID = {"L1": 0.5, "SSIM": 0.5, "smoothe": 0.1}
RECIPE_FLOW = {"flowL2": LOSS_FLOW["flowL2"], "flow_reg": LOSS_FLOW["flow_reg"]}
RECIPE_JOINT = {"cmbL1": 5.0, "cmbSSIM": 0.5, "smoothe": 0.1}


def miniature_plan(rigid_epochs: int, flow_epochs: int, joint_epochs: int,
                   lr: float = 1e-3) -> list[TrainStage]:
    """The plan-28 mechanic at minimum viable size: net groups change
    across rows exactly like config-example.py:128-141 (rigid rows ->
    a flow row -> joint rows whose flownet restores from the flow row's
    checkpoint and freezes -- trainer.StageRuntime applies the freeze,
    checkpoint.restore_params the per-net handoff)."""
    sw = SCALE_WEIGHT_T1
    return [
        TrainStage(RIGID_NETS, "synthetic", rigid_epochs, lr,
                   RECIPE_RIGID, sw, True),
        TrainStage(FLOW_NETS, "synthetic", flow_epochs, lr * 0.1,
                   RECIPE_FLOW, sw, True),
        TrainStage(JOINT_NETS, "synthetic", joint_epochs, lr * 0.1,
                   RECIPE_JOINT, sw, True),
    ]


def synthetic_factory(height: int = 64, width: int = 128,
                      train_batches: int = 6, val_batches: int = 2):
    """dataset_factory for train_by_plan over the GT-bearing renderer;
    the val split renders held-out textures/motions (different seed)."""
    from xpt_mde_tpu.data import SyntheticDataset

    def factory(dataset_name: str, split: str, batch_size: int):
        train = split == "train"
        return SyntheticDataset(
            batch_size=batch_size, height=height, width=width,
            num_batches=train_batches if train else val_batches,
            varying_depth=True, vary_motion=True,
            seed=0 if train else 99)
    return factory


def evaluate_checkpoint(cfg: Config, nets, val_data,
                        restore: bool = True) -> dict:
    """Held-out depth/pose metrics for the plan's current checkpoint
    (or the untrained init when ``restore=False``), through the real
    prediction + evaluation stack."""
    import jax.numpy as jnp

    from xpt_mde_tpu.evaluate.evaluate_main import (evaluate_depth_results,
                                                    evaluate_pose_results,
                                                    predict_dataset)
    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training.checkpoint import CheckpointManager
    from xpt_mde_tpu.training.train_step import (create_train_state,
                                                 make_predict_step)
    from xpt_mde_tpu.training.optimizers import optimizer_factory

    model = ModelFactory(val_data.config_keys(), nets, stereo=False,
                         depth_activation=cfg.depth_activation,
                         compute_dtype=cfg.compute_dtype).get_model()
    batch0 = {k: jnp.asarray(v) for k, v in next(iter(val_data)).items()}
    state = create_train_state(model, batch0,
                               optimizer_factory("adam_constant", 1e-4))
    if restore:
        ckpt_dir = Path(cfg.datapath_ckp) / cfg.ckpt_name
        state, loaded = CheckpointManager(ckpt_dir).restore_params(state)
        if not loaded:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    results = predict_dataset(model, state, val_data,
                              make_predict_step(model))
    depth = evaluate_depth_results(results).mean(axis=0)
    out = {"abs_rel": float(depth[0]), "rmse": float(depth[2]),
           "a1": float(depth[4])}
    if "pose" in results:
        pose = evaluate_pose_results(results).mean(axis=0)
        out.update({"trj_abs_err": float(pose[0]),
                    "trj_rel_err": float(pose[1]),
                    "rot_err": float(pose[2])})
    return out


def net_checkpoint_bytes(cfg: Config, net: str, suffix: str) -> bytes:
    """Raw msgpack bytes of one per-net checkpoint file (byte equality
    == exact weight equality: flax serialization is deterministic)."""
    path = Path(cfg.datapath_ckp) / cfg.ckpt_name / f"{net}_{suffix}.msgpack"
    return path.read_bytes()
