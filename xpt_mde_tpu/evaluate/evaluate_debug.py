"""Deep-inspection evaluator: per-frame losses, worst-frame dumps.

Re-designs /root/reference/evaluate/evaluate_debug.py:77-131: for every
test frame compute depth metrics, pose errors and the photometric
reconstruction error, write them to debug csvs, and dump side-by-side
reconstruction panels for the worst-N frames per metric.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from xpt_mde_tpu.evaluate.depth_metrics import (DEPTH_METRIC_NAMES,
                                                compute_depth_metrics,
                                                valid_depth_filter)
from xpt_mde_tpu.evaluate.pose_metrics import PoseMetric
from xpt_mde_tpu.utils.util_class import PathManager


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


def evaluate_for_debug(npz_path, debug_dir, worst_n: int = 10) -> dict:
    """Per-frame metric csvs + worst-frame image dumps
    (evaluate_debug.py:77-131)."""
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
