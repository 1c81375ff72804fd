"""Visualization tools: depth comparison panels and 3D point clouds.

Re-designs /root/reference/evaluate/compare_depth_main.py (side-by-side
colormapped disparity vs external methods' precomputed results) and
visualize_main.py (Open3D point-cloud overlays -- gated on open3d).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def colormap_disparity(depth: np.ndarray, max_depth: float = 80.0):
    """Viridis-colored disparity panel from a depth map."""
    import cv2

    depth = np.squeeze(depth)
    disp = np.zeros_like(depth)
    valid = depth > 1e-3
    disp[valid] = 1.0 / depth[valid]
    disp = disp / max(disp.max(), 1e-6)
    return cv2.applyColorMap((disp * 255).astype(np.uint8),
                             cv2.COLORMAP_VIRIDIS)


def compare_depths(npz_path, out_dir, external_disparities: dict | None = None,
                   stride: int = 10):
    """Side-by-side panels: image | ours | [external methods]
    (compare_depth_main.py:13-56). ``external_disparities`` maps method
    name -> [N, h, w] disparity arrays (e.g. monodepth1/2 precomputed)."""
    import cv2

    results = dict(np.load(npz_path))
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    num = results["depth"].shape[0]
    for i in range(0, num, stride):
        panels = [results["image"][i],
                  colormap_disparity(results["depth"][i])]
        h, w = panels[0].shape[:2]
        if external_disparities:
            for name, disps in external_disparities.items():
                disp = disps[i]
                disp = cv2.resize(disp / max(disp.max(), 1e-6), (w, h))
                panels.append(cv2.applyColorMap(
                    (disp * 255).astype(np.uint8), cv2.COLORMAP_VIRIDIS))
        cv2.imwrite(str(out_dir / f"compare_{i:05d}.png"),
                    np.concatenate(panels, axis=0))
    print(f"[compare_depths] wrote panels to {out_dir}")


def visualize_point_cloud(npz_path, frame: int = 0):
    """Open3D overlay of predicted vs GT depth point clouds
    (visualize_main.py:18-82). Gated on open3d availability."""
    try:
        import open3d as o3d
    except ImportError:
        print("[visualize_point_cloud] open3d not installed; "
              "use compare_depths for 2D panels instead")
        return None
    results = dict(np.load(npz_path))
    from xpt_mde_tpu.data.depth_map import depth_map_to_point_cloud

    k = results["intrinsic"][frame]
    pred_pts = depth_map_to_point_cloud(np.squeeze(results["depth"][frame]), k)
    clouds = []
    pred = o3d.geometry.PointCloud()
    pred.points = o3d.utility.Vector3dVector(pred_pts)
    pred.paint_uniform_color([1.0, 0.3, 0.0])
    clouds.append(pred)
    if "depth_gt" in results:
        gt_pts = depth_map_to_point_cloud(
            np.squeeze(results["depth_gt"][frame]), k)
        gt = o3d.geometry.PointCloud()
        gt.points = o3d.utility.Vector3dVector(gt_pts)
        gt.paint_uniform_color([0.0, 0.3, 1.0])
        clouds.append(gt)
    o3d.visualization.draw_geometries(clouds)
    return clouds
