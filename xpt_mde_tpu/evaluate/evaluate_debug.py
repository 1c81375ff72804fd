"""Deep-inspection evaluator: per-frame losses, trajectories, worst-frame
reconstruction dumps, and a gt-vs-pred scale inspection mode.

Re-designs /root/reference/evaluate/evaluate_debug.py:

- ``evaluate_for_debug`` (model-driven, :77-131): run the checkpointed
  model over a loader; per target frame compute the smoothness loss and
  depth AbsRel (+ the GT-median depth scale), per source frame the
  photometric reconstruction L1 loss, trajectory error (pred translation
  rescaled by the depth scale), travel distance and rotation error;
  write debug_depth.csv / debug_pose.csv / trajectory.csv; dump
  inspection views (target / recon-from-gt-pose / recon-from-pred /
  source / depth) for the worst-N frames per loss/metric.
- ``inspect_batches`` (:31-74 ModelValidaterInspect): per-batch printout
  of gt-vs-pred pose twists and the pose/depth scale ratios.
- ``evaluate_npz_debug`` keeps the npz-driven per-frame metric table for
  saved predictions (no model needed).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from xpt_mde_tpu.evaluate.depth_metrics import (DEPTH_METRIC_NAMES,
                                                compute_depth_metrics,
                                                valid_depth_filter)
from xpt_mde_tpu.evaluate.pose_metrics import PoseMetric
from xpt_mde_tpu.utils.util_class import PathManager


def _rotation_error(pose_pred: np.ndarray, pose_true: np.ndarray):
    """Geodesic rotation error per source frame [batch, numsrc]
    (eval_utils.py:61-75 formula)."""
    rel = np.einsum("bnij,bnik->bnjk", pose_pred[..., :3, :3],
                    pose_true[..., :3, :3])
    trace = np.trace(rel, axis1=-2, axis2=-1)
    return np.arccos(np.clip((trace - 1.0) / 2.0, -1.0, 1.0))


def _per_batch_quantities(feats, preds, smooth_fn):
    """All debug quantities for one batch, as numpy.

    :return: dict with smooth[B], abs_rel[B], scale[B], photo[B,N],
        trj_err[B,N], distance[B,N], rot_err[B,N], xyz_true/pred [B,N,3]
    """
    import jax.numpy as jnp

    from xpt_mde_tpu.ops.synthesize import synthesize_multi_scale
    from xpt_mde_tpu.losses.photometric import photometric_loss_l1
    from xpt_mde_tpu.utils import se3

    image5d = feats["image5d"]
    source, target = image5d[:, :-1], image5d[:, -1]
    depth0 = preds["depth_ms"][0]
    disp0 = preds["disp_ms"][0]
    batch = int(target.shape[0])

    out = {"smooth": np.asarray(smooth_fn(jnp.asarray(disp0),
                                          jnp.asarray(target)))}

    # depth AbsRel + GT-median scale per frame (evaluate_debug.py:208-224)
    abs_rel = np.full(batch, np.nan)
    scale = np.ones(batch)
    if "depth_gt" in feats:
        for b in range(batch):
            gt = np.squeeze(np.asarray(feats["depth_gt"][b]))
            if (gt > 1e-3).sum() < 10:
                continue
            pred, gt_v, scaler = valid_depth_filter(
                np.asarray(depth0[b]), gt, return_scale=True)
            abs_rel[b] = compute_depth_metrics(pred, gt_v)[0]
            scale[b] = scaler
    out["abs_rel"], out["scale"] = abs_rel, scale

    # photometric recon loss per source at full scale (:173-180)
    synth = synthesize_multi_scale(jnp.asarray(source),
                                   jnp.asarray(feats["intrinsic"]),
                                   [jnp.asarray(depth0)],
                                   jnp.asarray(preds["pose"]))[0]
    err = photometric_loss_l1(synth, jnp.asarray(target), reduce=False)
    out["photo"] = np.asarray(jnp.mean(err, axis=(2, 3, 4)))
    out["synth"] = np.asarray(synth)

    if "pose_gt" in feats:
        pose_pred_mat = np.asarray(se3.twist_to_matrix(
            jnp.asarray(preds["pose"])))
        pose_true_mat = np.asarray(feats["pose_gt"])
        xyz_pred = pose_pred_mat[:, :, :3, 3]
        xyz_true = pose_true_mat[:, :, :3, 3]
        # trajectory error with the depth-derived scale (:190-205)
        diff = xyz_true - xyz_pred * scale[:, None, None]
        out["trj_err"] = np.sqrt((diff ** 2).sum(axis=2))
        out["distance"] = np.sqrt((xyz_true ** 2).sum(axis=2))
        out["rot_err"] = _rotation_error(pose_pred_mat, pose_true_mat)
        out["xyz_true"] = xyz_true
        out["xyz_pred"] = xyz_pred * scale[:, None, None]
    return out


def evaluate_for_debug(state, loader, predict_step, debug_dir,
                       worst_n: int = 5, image_gradient_factor: float = 4.0):
    """Model-driven debug evaluation (evaluate_debug.py:77-131).

    :param state: restored train state
    :param loader: test/val loader yielding feature dicts
    :param predict_step: jitted forward (training/train_step.py)
    :return: {"depth_rows", "pose_rows", "worst"} tables
    """
    import jax.numpy as jnp

    from xpt_mde_tpu.losses.total import SmoothenessLossMultiScale

    smooth_fn = SmoothenessLossMultiScale(
        [1.0], image_gradient_factor=image_gradient_factor).smootheness_loss

    depth_rows, pose_rows, traj_rows = [], [], []
    frames_cache = []  # (target_u8, source_u8, synth, depth, pose data)
    frame = 0
    from xpt_mde_tpu.training.train_step import decode_image_features

    for batch in loader:
        # raw-uint8 loader batches are decoded here once; the cached frames
        # and per-batch quantities below all expect float [-1, 1] images
        feats = decode_image_features(
            {k: jnp.asarray(v) for k, v in batch.items()})
        preds = predict_step(state, feats)
        q = _per_batch_quantities(feats, preds, smooth_fn)
        batch_n, numsrc = q["photo"].shape
        for b in range(batch_n):
            depth_rows.append([frame, float(q["smooth"][b]),
                               float(q["abs_rel"][b])])
            for s in range(numsrc):
                pose_rows.append([
                    frame, s, float(q["photo"][b, s]),
                    float(q.get("trj_err", np.zeros_like(q["photo"]))[b, s]),
                    float(q.get("distance", np.zeros_like(q["photo"]))[b, s]),
                    float(q.get("rot_err", np.zeros_like(q["photo"]))[b, s])])
                if "xyz_true" in q:
                    traj_rows.append([frame, s, *q["xyz_true"][b, s],
                                      *q["xyz_pred"][b, s]])
            frames_cache.append({
                "target": np.asarray(feats["image5d"][b, -1]),
                "source": np.asarray(feats["image5d"][b, 0]),
                "synth": q["synth"][b, 0],
                "depth": np.asarray(preds["depth_ms"][0][b]),
                "feats": {k: np.asarray(v[b:b + 1]) for k, v in feats.items()},
                "pose": np.asarray(preds["pose"][b:b + 1]),
            })
            frame += 1

    debug_dir = Path(debug_dir)
    with PathManager(debug_dir) as pm:
        _write_csv(debug_dir / "debug_depth.csv",
                   "frame,smooth_loss,depth_err", depth_rows)
        _write_csv(debug_dir / "debug_pose.csv",
                   "frame,srcidx,photo_loss,trj_err,distance,rot_err",
                   pose_rows)
        _write_csv(debug_dir / "trajectory.csv",
                   "frame,srcidx,tx_gt,ty_gt,tz_gt,tx_pr,ty_pr,tz_pr",
                   traj_rows)

        worst = _find_worst(depth_rows, pose_rows, worst_n)
        for key, frames in worst.items():
            _dump_inspection_views(frames_cache, frames,
                                   debug_dir / f"worst_{key}")
        pm.set_ok()
    return {"depth_rows": depth_rows, "pose_rows": pose_rows, "worst": worst}


def debug_by_plan(cfg, dataset_factory=None) -> None:
    """Walk TEST_PLAN running the model-driven debug evaluation per stage
    (the reference's ModelValidaterDebug driver, evaluate_debug.py:92-131):
    restore the stage checkpoint, run the test split, write per-frame
    csvs + worst-N inspection views under datapath_evl."""
    import jax.numpy as jnp

    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training.checkpoint import CheckpointManager
    from xpt_mde_tpu.training.optimizers import optimizer_factory
    from xpt_mde_tpu.training.train_step import (create_train_state,
                                                 decode_image_features,
                                                 make_predict_step)
    from xpt_mde_tpu.training.trainer import default_dataset_factory

    dataset_factory = dataset_factory or default_dataset_factory(cfg)
    for stage in cfg.test_plan:
        debug_dir = (Path(cfg.datapath_evl) / stage.ckpt_name
                     / f"debug_{stage.dataset}_{stage.weight_suffix}")
        if debug_dir.exists():
            print(f"[debug_by_plan] exists, skip: {debug_dir}")
            continue
        loader = dataset_factory(stage.dataset, "test", cfg.batch_size)
        keys = loader.config_keys() if hasattr(loader, "config_keys") else \
            loader.ds.keys()
        model = ModelFactory(keys, stage.net_names, cfg.depth_activation,
                             stereo=cfg.stereo, high_res=cfg.high_res,
                             compute_dtype=cfg.compute_dtype).get_model()
        from xpt_mde_tpu.data import example_batch
        batch = decode_image_features(
            {k: jnp.asarray(v) for k, v in example_batch(loader).items()})
        state = create_train_state(model, batch,
                                   optimizer_factory(cfg.optimizer, 1e-4))
        ckpt = CheckpointManager(Path(cfg.datapath_ckp) / stage.ckpt_name)
        state, loaded = ckpt.restore_params(state, stage.weight_suffix)
        if not loaded:
            print(f"[debug_by_plan] no weights for {stage.ckpt_name}, skip")
            continue
        out = evaluate_for_debug(state, loader, make_predict_step(model),
                                 debug_dir)
        print(f"[debug_by_plan] {stage.ckpt_name}: "
              f"{len(out['depth_rows'])} frames, worst dumped for "
              f"{list(out['worst'])}")


def _write_csv(path: Path, header: str, rows) -> None:
    lines = [header]
    for r in rows:
        lines.append(",".join(str(int(v)) if i < (2 if "srcidx" in header
                                                  else 1) else f"{v:.6f}"
                              for i, v in enumerate(r)))
    path.write_text("\n".join(lines) + "\n")


def _find_worst(depth_rows, pose_rows, worst_n: int) -> dict:
    """Worst frame indices per loss/metric (evaluate_debug.py:252-270)."""
    worst = {}
    tables = {"smooth_loss": [(r[1], r[0]) for r in depth_rows],
              "depth_err": [(r[2], r[0]) for r in depth_rows],
              "photo_loss": [(r[2], r[0]) for r in pose_rows],
              "trj_err": [(r[3], r[0]) for r in pose_rows],
              "rot_err": [(r[5], r[0]) for r in pose_rows]}
    for key, scored in tables.items():
        scored = [(v, f) for v, f in scored if np.isfinite(v)]
        if not scored:
            continue
        scored.sort(reverse=True)
        seen, frames = set(), []
        for _, f in scored:
            if f not in seen:
                seen.add(f)
                frames.append(f)
            if len(frames) >= worst_n:
                break
        worst[key] = frames
    return worst


def _to_u8(img) -> np.ndarray:
    return ((np.clip(img, -1, 1) + 1) / 2 * 255).astype(np.uint8)


def _dump_inspection_views(frames_cache, frames, out_dir: Path) -> None:
    """5-panel inspection view per worst frame (evaluate_debug.py:84-90):
    target / recon-from-gt-pose / recon-from-pred / source / depth."""
    try:
        import cv2
    except ImportError:
        return
    import jax.numpy as jnp

    from xpt_mde_tpu.ops.synthesize import synthesize_multi_scale
    from xpt_mde_tpu.utils import se3

    out_dir.mkdir(parents=True, exist_ok=True)
    for f in frames:
        entry = frames_cache[f]
        panels = [_to_u8(entry["target"])]
        feats = entry["feats"]
        if "pose_gt" in feats:
            gt_twist = se3.matrix_to_twist(jnp.asarray(feats["pose_gt"]))
            synth_gt = synthesize_multi_scale(
                jnp.asarray(feats["image5d"][:, :-1]),
                jnp.asarray(feats["intrinsic"]),
                [jnp.asarray(entry["depth"][None])], gt_twist)[0]
            panels.append(_to_u8(np.asarray(synth_gt[0, 0])))
        panels.append(_to_u8(entry["synth"]))
        panels.append(_to_u8(entry["source"]))
        d8 = (np.clip(np.squeeze(entry["depth"]) / 80.0, 0, 1)
              * 255).astype(np.uint8)
        panels.append(cv2.applyColorMap(d8, cv2.COLORMAP_VIRIDIS))
        cv2.imwrite(str(out_dir / f"frame_{f:05d}.png"),
                    np.concatenate(panels, axis=0))


def inspect_batches(state, loader, predict_step, max_batches: int = 3):
    """gt-vs-pred scale inspection (ModelValidaterInspect,
    evaluate_debug.py:31-74): per batch print pose twists and the
    pose/depth scale ratios. Returns the printed rows for testing."""
    import jax.numpy as jnp

    from xpt_mde_tpu.utils import se3

    rows = []
    for i, batch in enumerate(loader):
        if i >= max_batches:
            break
        feats = {k: jnp.asarray(v) for k, v in batch.items()}
        preds = predict_step(state, feats)
        row = {}
        if "pose_gt" in feats:
            gt_vec = np.asarray(se3.matrix_to_twist(
                jnp.asarray(feats["pose_gt"])))
            pr_vec = np.asarray(preds["pose"])
            xyz_t, xyz_p = gt_vec[:, :, :3], pr_vec[:, :, :3]
            scale = (xyz_t * xyz_p).sum(2) / np.maximum(
                (xyz_p ** 2).sum(2), 1e-12)
            row["pose_gt"] = gt_vec[0, 0]
            row["pose_pr"] = pr_vec[0, 0]
            row["pose_scale"] = float(scale[0, 0])
            print(f"  pose gt: {gt_vec[0, 0]}")
            print(f"  pose pr: {pr_vec[0, 0]}")
            print(f"  pose scale: {row['pose_scale']:1.4f}")
        if "depth_gt" in feats:
            gt = np.asarray(feats["depth_gt"])
            pr = np.asarray(preds["depth_ms"][0])
            gt_mean = gt[gt > 1e-3].mean() if (gt > 1e-3).any() else np.nan
            pr_mean = pr.mean()
            row["depth_scale"] = float(gt_mean / pr_mean)
            print(f"  depth scale (gt/pred): {row['depth_scale']:1.4f} "
                  f"gt={gt_mean:1.3f} pred={pr_mean:1.3f}")
        rows.append(row)
    return rows


def evaluate_npz_debug(npz_path, debug_dir, worst_n: int = 10) -> dict:
    """npz-driven per-frame metric table + worst-frame dumps for saved
    predictions (no model forward needed)."""
    results = dict(np.load(npz_path))
    rows = per_frame_metrics(results)
    debug_dir = Path(debug_dir)
    with PathManager(debug_dir) as pm:
        keys = sorted({k for r in rows for k in r if k != "frame"})
        lines = ["frame," + ",".join(keys)]
        for r in rows:
            lines.append(str(r["frame"]) + "," +
                         ",".join(f"{r.get(k, float('nan')):.6f}" for k in keys))
        (debug_dir / "debug_metrics.csv").write_text("\n".join(lines) + "\n")

        worst = {}
        for key in ("abs_rel", "rmse", "trj_abs_err", "rot_err"):
            scored = [(r.get(key), r["frame"]) for r in rows
                      if key in r and np.isfinite(r.get(key, np.nan))]
            if not scored:
                continue
            scored.sort(reverse=True)
            worst[key] = [f for _, f in scored[:worst_n]]
            if "image" in results:
                _dump_frames(results, worst[key], debug_dir / f"worst_{key}")
        pm.set_ok()
    return {"rows": rows, "worst": worst}


def per_frame_metrics(results: dict, min_depth=1e-3, max_depth=80.0):
    """[N, ...] prediction arrays -> per-frame metric table."""
    num = results["depth"].shape[0] if "depth" in results else \
        results["pose"].shape[0]
    rows = []
    for i in range(num):
        row = {"frame": i}
        if "depth" in results and "depth_gt" in results:
            gt_i = np.squeeze(results["depth_gt"][i])
            if (gt_i > min_depth).sum() >= 10:
                pred, gt = valid_depth_filter(results["depth"][i], gt_i,
                                              min_depth, max_depth)
                row.update(dict(zip(DEPTH_METRIC_NAMES,
                                    compute_depth_metrics(pred, gt))))
        if "pose" in results and "pose_gt" in results:
            pm = PoseMetric().compute_pose_errors(results["pose"][i:i + 1],
                                                  results["pose_gt"][i:i + 1])
            row["trj_abs_err"] = float(pm.trj_abs_err.mean())
            row["trj_rel_err"] = float(pm.trj_rel_err.mean())
            row["rot_err"] = float(pm.rot_err.mean())
        rows.append(row)
    return rows


def _dump_frames(results: dict, frames, out_dir: Path):
    try:
        import cv2
    except ImportError:
        return
    out_dir.mkdir(parents=True, exist_ok=True)
    for f in frames:
        panels = [results["image"][f]]
        if "depth" in results:
            d = np.squeeze(results["depth"][f])
            d8 = (np.clip(d / 80.0, 0, 1) * 255).astype(np.uint8)
            panels.append(cv2.applyColorMap(d8, cv2.COLORMAP_VIRIDIS))
        if "depth_gt" in results:
            g = np.squeeze(results["depth_gt"][f])
            g8 = (np.clip(g / 80.0, 0, 1) * 255).astype(np.uint8)
            panels.append(cv2.applyColorMap(g8, cv2.COLORMAP_VIRIDIS))
        panel = np.concatenate(panels, axis=0)
        cv2.imwrite(str(out_dir / f"frame_{f:05d}.png"), panel)
