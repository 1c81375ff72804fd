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
        if hist_file.exists():
            header = hist_file.read_text().splitlines()[0].split(",")
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
        """Save target / synthesized / depth panels for visual inspection
        (logger.py:147-169). Uses the first `num` examples of the batch."""
        try:
            import cv2

            from xpt_mde_tpu.ops.synthesize import synthesize_multi_scale

            out_dir = self.ckpt_dir / "reconstruction"
            out_dir.mkdir(exist_ok=True)
            image5d = np.asarray(features["image5d"])
            if "depth_ms" not in preds or "pose" not in preds:
                return
            import jax.numpy as jnp
            synth = np.asarray(synthesize_multi_scale(
                jnp.asarray(image5d[:, :-1]),
                jnp.asarray(np.asarray(features["intrinsic"])),
                [jnp.asarray(np.asarray(preds["depth_ms"][0]))],
                jnp.asarray(np.asarray(preds["pose"])))[0])
            depth = np.asarray(preds["depth_ms"][0])
            for i in range(min(num, image5d.shape[0])):
                target = image5d[i, -1]
                source = image5d[i, 0]
                synth0 = synth[i, 0]
                dview = depth[i, :, :, 0]
                dview = (np.clip(dview / 80.0, 0, 1) * 255).astype(np.uint8)
                dview = cv2.applyColorMap(dview, cv2.COLORMAP_VIRIDIS)

                def to8(img):
                    return ((np.clip(img, -1, 1) + 1) / 2 * 255).astype(np.uint8)

                panel = np.concatenate(
                    [to8(target), to8(source), to8(synth0), dview], axis=0)
                cv2.imwrite(str(out_dir / f"ep{epoch:03d}_{i}.png"), panel)
        except Exception as e:
            print(f"[TrainingLogger] recon samples failed: {e}")


def print_progress(msg: str):
    """In-place progress line (util_funcs.py:13-29)."""
    print(f"\r{msg}", end="", flush=True)
