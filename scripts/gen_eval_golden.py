"""Generate golden parity fixtures by running the reference's own numpy
evaluation/serialization code as an oracle (VERDICT r1 missing #2 /
next-round item 10).

Runs only where /root/reference exists (this build environment); the
resulting tests/fixtures/eval_golden.npz is checked in so CI pins our
implementations against the reference outputs forever:

- evaluate/eval_utils.py:109-154  valid_depth_filter + compute_depth_metrics
- evaluate/eval_utils.py:9-85     PoseMetricNumpy snippet pose errors
- tfrecords/tfr_util.py:133-185   point_cloud_to_depth_map LiDAR splatting
- utils/convert_pose.py:74-148    twist -> SE(3) matrix (numpy batch)

No reference code is copied -- it is imported (with stub config/settings
modules for its gitignored config.py) and executed on fixed random
inputs; only the inputs and outputs are stored.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


def _import_reference():
    stub = Path(tempfile.mkdtemp(prefix="refstub_"))
    (stub / "config.py").write_text(
        "class opts:\n"
        "    MIN_DEPTH = 1e-3\n"
        "    MAX_DEPTH = 80.0\n"
        "    SNIPPET_LEN = 5\n"
        "    ENABLE_SHAPE_DECOR = False\n")
    (stub / "settings.py").write_text("")
    (stub / "quaternion.py").write_text(
        "def from_rotation_matrix(*a, **k):\n"
        "    raise NotImplementedError\n")
    # tfr_util's module-level test-trailer import; unused by the oracle fns
    (stub / "pykitti.py").write_text("")
    sys.path.insert(0, str(REFERENCE))
    sys.path.insert(0, str(stub))
    from evaluate import eval_utils as ev
    from tfrecords import tfr_util as tu
    import utils.convert_pose as cp
    return ev, tu, cp


def main():
    ev, tu, cp = _import_reference()
    rng = np.random.RandomState(42)
    out = {}

    # --- depth metrics: dense, noisy-scale, and LiDAR-sparse GT frames
    for i, (h, w, sparse) in enumerate([(64, 128, False), (96, 320, False),
                                        (64, 128, True)]):
        pred = rng.uniform(0.5, 90, (h, w))
        if sparse:
            gt = np.zeros((h, w))
            ys = rng.randint(0, h, 800)
            xs = rng.randint(0, w, 800)
            gt[ys, xs] = rng.uniform(1, 79, 800)
        else:
            gt = rng.uniform(0, 85, (h, w))
        p, g = ev.valid_depth_filter(pred.copy(), gt.copy())
        metrics = ev.compute_depth_metrics(p, g)
        out[f"depth{i}_pred"] = pred
        out[f"depth{i}_gt"] = gt
        out[f"depth{i}_metrics"] = np.asarray(metrics)
        out[f"depth{i}_nvalid"] = np.asarray(p.shape[0])

    # --- snippet pose errors
    pose_pred = rng.uniform(-0.5, 0.5, (3, 4, 6))
    twist_true = rng.uniform(-0.5, 0.5, (3, 4, 6))
    pose_true = np.asarray(cp.pose_rvec2matr_batch_np(twist_true))
    pm = ev.PoseMetricNumpy()
    pm.compute_pose_errors(pose_pred, pose_true)
    out["pose_pred"] = pose_pred
    out["pose_true_mat"] = pose_true
    out["pose_trj_abs_err"] = pm.trj_abs_err
    out["pose_trj_rel_err"] = pm.trj_rel_err
    out["pose_rot_err"] = pm.rot_err

    # --- twist -> matrix convention pin (incl. small-angle branch)
    twists = rng.uniform(-1.0, 1.0, (2, 4, 6))
    twists[0, 0, 3:] = 1e-8  # small-angle branch
    out["se3_twists"] = twists
    out["se3_matrices"] = np.asarray(cp.pose_rvec2matr_batch_np(twists))

    # --- LiDAR splatting (bilinear 4-neighbor weight accumulation + dedup)
    intrinsic = np.array([[200.0, 0, 64], [0, 210.0, 32], [0, 0, 1]])
    pcd = np.stack([rng.uniform(-10, 10, 600), rng.uniform(-3, 6, 600),
                    rng.uniform(0.5, 60, 600)], axis=1)
    out["splat_pcd"] = pcd
    out["splat_intrinsic"] = intrinsic
    out["splat_depth_map"] = np.asarray(
        tu.point_cloud_to_depth_map(pcd.copy(), intrinsic, (64, 128)))

    fix_dir = REPO / "tests" / "fixtures"
    fix_dir.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(fix_dir / "eval_golden.npz", **out)
    print(f"wrote {fix_dir / 'eval_golden.npz'} "
          f"({(fix_dir / 'eval_golden.npz').stat().st_size} bytes)")


if __name__ == "__main__":
    main()
