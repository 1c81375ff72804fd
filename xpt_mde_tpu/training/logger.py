"""File-based training observability.

Re-designs /root/reference/model/model_util/logger.py: history.csv with
train/val column prefixes, mean_result.csv, history.png loss curves, and
per-epoch reconstruction-sample panels. All file-based, no services --
matching the reference's philosophy (SURVEY.md §5).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class TrainingLogger:
    def __init__(self, ckpt_dir, log_loss: bool = True):
        self.ckpt_dir = Path(ckpt_dir)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.log_loss = log_loss

    def save_log(self, epoch: int, train_metrics: dict, val_metrics: dict):
        """Append one epoch row to history.csv (train `:` and val `!`
        prefixes in the reference become train_/val_ columns here)."""
        row = {"epoch": epoch}
        row.update({f"train_{k.replace('/', '_')}": float(v)
                    for k, v in train_metrics.items()})
        row.update({f"val_{k.replace('/', '_')}": float(v)
                    for k, v in val_metrics.items()})
        hist_file = self.ckpt_dir / "history.csv"
        # a crash/full disk can leave the csv present but empty -- fall
        # through to the fresh-file branch instead of IndexError-ing
        if hist_file.exists() and hist_file.read_text().strip():
            lines = hist_file.read_text().splitlines()
            header = lines[0].split(",")
            new_cols = [k for k in row if k not in header]
            if new_cols:
                # a later stage introduced metrics (e.g. flow losses, or
                # the first stage with a val split): widen the csv so
                # nothing is silently dropped
                header += new_cols
                pad = "," * len(new_cols)
                body = [lines[0] + "," + ",".join(new_cols)]
                body += [ln + pad for ln in lines[1:]]
                hist_file.write_text("\n".join(body) + "\n")
                self._write_column_guide(header)
            values = [str(row.get(h, "")) for h in header]
            with open(hist_file, "a") as fh:
                fh.write(",".join(values) + "\n")
        else:
            header = list(row.keys())
            with open(hist_file, "w") as fh:
                fh.write(",".join(header) + "\n")
                fh.write(",".join(str(row[h]) for h in header) + "\n")
            self._write_column_guide(header)
        self.save_mean_result()
        self.save_history_plot()

    def _write_column_guide(self, header):
        """Column legend (the reference's how-to-read-columns.txt,
        logger.py:24-122)."""
        lines = ["history.csv columns:",
                 "  train_* : training-epoch means",
                 "  val_*   : validation-epoch means",
                 "  loss_<name> : per-loss-type component (recipe weights"
                 " NOT applied)", ""]
        lines += [f"  {h}" for h in header]
        (self.ckpt_dir / "how-to-read-columns.txt").write_text(
            "\n".join(lines) + "\n")

    def save_mean_result(self):
        """Per-loss-type means over all epochs (mean_result.csv role)."""
        try:
            import pandas as pd
            df = pd.read_csv(self.ckpt_dir / "history.csv")
            means = df.drop(columns=["epoch"]).mean(numeric_only=True)
            means.to_csv(self.ckpt_dir / "mean_result.csv",
                         header=["mean"], index_label="metric")
        except Exception as e:
            print(f"[TrainingLogger] mean_result failed: {e}")

    def save_history_plot(self):
        """history.png with train/val loss curves (logger.py:125-144)."""
        hist_file = self.ckpt_dir / "history.csv"
        if not hist_file.exists():
            return
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import pandas as pd
            df = pd.read_csv(hist_file)
            fig, ax = plt.subplots(figsize=(8, 5))
            for col in ("train_loss", "val_loss"):
                if col in df:
                    ax.plot(df["epoch"], df[col], label=col)
            ax.set_xlabel("epoch")
            ax.set_ylabel("loss")
            ax.legend()
            ax.grid(True, alpha=0.3)
            fig.savefig(self.ckpt_dir / "history.png", dpi=80)
            plt.close(fig)
        except Exception as e:  # plotting must never kill training
            print(f"[TrainingLogger] plot failed: {e}")

    def save_scales(self, epoch: int, preds: dict):
        """Append quantiles of predicted quantities (logger.py:172-184)."""
        lines = [f"epoch {epoch}"]
        for key in ("depth_ms", "pose"):
            if key not in preds:
                continue
            val = preds[key][0] if isinstance(preds[key], list) else preds[key]
            val = np.asarray(val)
            qs = np.quantile(val, [0.02, 0.25, 0.5, 0.75, 0.98])
            lines.append(f"  {key}: " + " ".join(f"{q:.4f}" for q in qs))
        with open(self.ckpt_dir / "scales.txt", "a") as fh:
            fh.write("\n".join(lines) + "\n")

    def save_reconstruction_samples(self, epoch: int, features: dict,
                                    preds: dict, num: int = 4):
        """Save titled reconstruction panels for visual inspection
        (logger.py:147-169, 208-253): target / depth / source /
        rigid-synthesized views, plus flow (flow_to_image) and
        flow-warped views for joint stages and right-target /
        stereo-cross-synthesized views for stereo stages."""
        try:
            import cv2

            out_dir = self.ckpt_dir / "reconstruction"
            out_dir.mkdir(exist_ok=True)
            image5d = np.asarray(features["image5d"])
            if "depth_ms" not in preds or "pose" not in preds:
                return
            views = _reconstruction_views(features, preds)
            for i in range(min(num, image5d.shape[0])):
                panel = stack_titled_images(
                    {name: img[i] for name, img in views.items()})
                cv2.imwrite(str(out_dir / f"ep{epoch:03d}_{i}.png"), panel)
        except Exception as e:
            print(f"[TrainingLogger] recon samples failed: {e}")


def _reconstruction_views(features: dict, preds: dict) -> dict:
    """Per-sample view images [B, h, w, 3] keyed by panel title, mirroring
    the reference's stack_reconstruction_images (logger.py:208-241)."""
    import jax.numpy as jnp

    from xpt_mde_tpu.ops.flow_warp import flow_warp_multi_scale
    from xpt_mde_tpu.ops.synthesize import synthesize_multi_scale
    from xpt_mde_tpu.utils import se3

    image5d = np.asarray(features["image5d"])
    intrinsic = jnp.asarray(np.asarray(features["intrinsic"]))
    source = jnp.asarray(image5d[:, :-1])
    depth0 = jnp.asarray(np.asarray(preds["depth_ms"][0]))
    pose = jnp.asarray(np.asarray(preds["pose"]))

    views = {"left_target": image5d[:, -1]}
    depth = np.asarray(preds["depth_ms"][0])[:, :, :, 0]
    depth8 = (np.clip(depth / 80.0, 0, 1) * 255).astype(np.uint8)
    views["target_depth"] = _viridis(depth8)
    views["source_0"] = image5d[:, 0]
    synth = np.asarray(synthesize_multi_scale(source, intrinsic,
                                              [depth0], pose)[0])
    views["synthesized_from_src0"] = synth[:, 0]

    if "flow_ms" in preds:
        flow0 = np.asarray(preds["flow_ms"][0])  # [B, N, h/4, w/4, 2]
        views["flow"] = np.stack(
            [flow_to_image(flow0[b, 0]) for b in range(flow0.shape[0])])
        warped = np.asarray(flow_warp_multi_scale(
            source, [jnp.asarray(flow0)])[0])
        views["synthesized_by_flow"] = warped[:, 0]

    if "image5d_R" in features and "depth_ms" in preds \
            and "stereo_T_LR" in features:
        target_r = jnp.asarray(np.asarray(features["image5d_R"])[:, -1])
        t_lr = jnp.asarray(np.asarray(features["stereo_T_LR"]))
        # synthesize_multi_scale takes 4x4 matrices directly (same form
        # losses/total.py uses) -- no twist roundtrip through the
        # theta~pi-degenerate parametrization
        pose_rl = se3.invert_matrix(t_lr)[:, None]
        stereo_synth = np.asarray(synthesize_multi_scale(
            target_r[:, None], intrinsic, [depth0], pose_rl)[0])
        views["right_source"] = np.asarray(target_r)
        views["synthesized_from_right"] = stereo_synth[:, 0]
    return views


def _viridis(gray8: np.ndarray) -> np.ndarray:
    import cv2
    out = np.stack([cv2.applyColorMap(g, cv2.COLORMAP_VIRIDIS)
                    for g in gray8])
    return out.astype(np.float32) / 127.5 - 1.0  # back to [-1, 1] float


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """Optical flow -> RGB (reference logger.py:243-253, formula-exact:
    red/green encode horizontal flow sign, blue the vertical magnitude).
    Values land in [0, 1] -- the upper half of the [-1, 1] display range
    -- which matches the reference's rendering (its to_uint8_image also
    maps [-1, 1] to 0..255, so flow panels are mid-gray-to-white there
    too). Kept for parity; don't 'fix' the contrast here."""
    flow = np.clip(np.asarray(flow, np.float32), -10, 10) / 10
    height, width, _ = flow.shape
    image = np.ones((height, width, 3), dtype=np.float32)
    image[:, :, 0] = 1 - flow[:, :, 0]
    image[:, :, 1] = 1 + flow[:, :, 0]
    image[:, :, 2] = 1 - np.abs(flow[:, :, 1])
    return np.clip(image, -1, 1)


def stack_titled_images(views: dict) -> np.ndarray:
    """Stack [-1,1]-float views vertically with title banners into one
    uint8 image (util_funcs.py:193-219 role). Views smaller than the
    first are upscaled to its width."""
    import cv2

    base_w = views[next(iter(views))].shape[1]
    panels = []
    for name, img in views.items():
        img = np.asarray(img)
        img8 = ((np.clip(img, -1, 1) + 1) / 2 * 255).astype(np.uint8)
        if img8.shape[1] != base_w:
            scale = base_w / img8.shape[1]
            img8 = cv2.resize(img8, (base_w, int(img8.shape[0] * scale)),
                              interpolation=cv2.INTER_NEAREST)
        banner = np.zeros((12, base_w, 3), np.uint8)
        cv2.putText(banner, name, (2, 9), cv2.FONT_HERSHEY_PLAIN, 0.7,
                    (255, 255, 255), 1)
        panels.extend([banner, img8])
    return np.concatenate(panels, axis=0)


def print_progress(msg: str):
    """In-place progress line (util_funcs.py:13-29)."""
    print(f"\r{msg}", end="", flush=True)
