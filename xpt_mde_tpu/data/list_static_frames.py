"""Offline tool: optical-flow based static-frame detection.

Re-designs /root/reference/tfrecords/resources/list_static_frames.py:
for each KITTI-odometry sequence, compute dense Farneback optical flow
between consecutive frames and flag frames whose valid-flow ratio is
below threshold (the vehicle is not moving). Output format matches the
static-frames resource files: "<drive> <frame_id>" lines.

Usage (data-prep machine):
    python -m xpt_mde_tpu.data.list_static_frames <kitti_odom_root> <out.txt>
"""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np


def flow_valid_ratio(frame_a: np.ndarray, frame_b: np.ndarray,
                     min_flow: float = 2.0, max_flow: float = 50.0) -> float:
    """Fraction of pixels with plausible inter-frame motion."""
    gray_a = cv2.cvtColor(frame_a, cv2.COLOR_BGR2GRAY)
    gray_b = cv2.cvtColor(frame_b, cv2.COLOR_BGR2GRAY)
    flow = cv2.calcOpticalFlowFarneback(
        gray_a, gray_b, flow=None, pyr_scale=0.5, levels=3, winsize=10,
        iterations=3, poly_n=5, poly_sigma=1.1, flags=0)
    dist = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    valid = np.count_nonzero((min_flow < dist) & (dist < max_flow))
    return valid / dist.size


def list_static_frames(seq_dir, threshold: float = 0.5,
                       subsample: int = 1) -> list[int]:
    """Frame ids in one sequence dir whose flow to the previous frame is
    mostly static."""
    seq_dir = Path(seq_dir)
    frames = sorted((seq_dir / "image_2").glob("*.png"))
    static = []
    prev = None
    for i, path in enumerate(frames):
        if i % subsample:
            continue
        img = cv2.imread(str(path))
        if img is None:
            continue
        img = cv2.resize(img, (img.shape[1] // 2, img.shape[0] // 2))
        if prev is not None and flow_valid_ratio(prev, img) < threshold:
            static.append(int(path.stem))
        prev = img
    return static


def main(kitti_odom_root, out_path):
    root = Path(kitti_odom_root)
    lines = []
    for seq_dir in sorted((root / "sequences").glob("[0-9][0-9]")):
        seq = seq_dir.name
        static = list_static_frames(seq_dir)
        lines.extend(f"{seq} {fid:06d}" for fid in static)
        print(f"[list_static_frames] {seq}: {len(static)} static frames")
    Path(out_path).write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
