"""Training-logger reconstruction panels (reference logger.py:147-253):
rigid panels, flow panels via flow_to_image, stereo cross-synth panels.
"""

import numpy as np
import pytest

from xpt_mde_tpu.training.logger import (TrainingLogger, flow_to_image,
                                         stack_titled_images,
                                         _reconstruction_views)

cv2 = pytest.importorskip("cv2")


def test_flow_to_image_encoding():
    """Reference encoding (logger.py:243-253): R=1-u/10, G=1+u/10,
    B=1-|v|/10, clipped to [-1, 1]."""
    flow = np.zeros((4, 6, 2), np.float32)
    flow[0, 0] = (10, 0)    # strong right flow
    flow[1, 1] = (-10, 5)   # strong left + down
    img = flow_to_image(flow)
    assert img.shape == (4, 6, 3)
    assert np.allclose(img[2, 2], [1, 1, 1])          # zero flow is white
    assert np.allclose(img[0, 0], [0, 1, 1])          # right flow
    assert np.allclose(img[1, 1], [1, 0, 0.5])        # left + down flow


def _fake_features_preds(stereo=False, flow=False, b=2, h=32, w=64):
    rng = np.random.RandomState(0)
    feats = {"image5d": rng.rand(b, 5, h, w, 3).astype(np.float32) * 2 - 1,
             "intrinsic": np.tile(np.array(
                 [[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]],
                 np.float32), (b, 1, 1))}
    preds = {"depth_ms": [rng.uniform(2, 60, (b, h, w, 1)).astype(np.float32)],
             "pose": rng.uniform(-0.05, 0.05, (b, 4, 6)).astype(np.float32)}
    if flow:
        preds["flow_ms"] = [rng.uniform(-2, 2, (b, 4, h // 4, w // 4, 2))
                            .astype(np.float32)]
    if stereo:
        feats["image5d_R"] = rng.rand(b, 5, h, w, 3).astype(np.float32) * 2 - 1
        t_lr = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        t_lr[:, 0, 3] = 0.5
        feats["stereo_T_LR"] = t_lr
    return feats, preds


def test_recon_views_rigid():
    views = _reconstruction_views(*_fake_features_preds())
    assert set(views) == {"left_target", "target_depth", "source_0",
                          "synthesized_from_src0"}
    assert all(v.shape[0] == 2 for v in views.values())


def test_recon_views_joint_and_stereo():
    views = _reconstruction_views(*_fake_features_preds(stereo=True,
                                                        flow=True))
    for key in ("flow", "synthesized_by_flow", "right_source",
                "synthesized_from_right"):
        assert key in views, key
    assert views["flow"].shape == (2, 8, 16, 3)          # flow scale h/4
    assert views["synthesized_from_right"].shape == (2, 32, 64, 3)


def test_save_reconstruction_samples_writes_panels(tmp_path):
    logger = TrainingLogger(tmp_path)
    feats, preds = _fake_features_preds(stereo=True, flow=True)
    logger.save_reconstruction_samples(3, feats, preds, num=2)
    files = sorted((tmp_path / "reconstruction").glob("ep003_*.png"))
    assert len(files) == 2
    panel = cv2.imread(str(files[0]))
    # 8 titled panels stacked vertically at the target width
    assert panel.shape[1] == 64
    assert panel.shape[0] > 8 * 12  # banners + images


def test_stack_titled_images_resizes_small_views():
    views = {"a": np.zeros((16, 32, 3), np.float32),
             "b": np.zeros((4, 8, 3), np.float32)}
    panel = stack_titled_images(views)
    assert panel.shape[1] == 32
    assert panel.dtype == np.uint8


def test_history_csv_widens_for_new_metrics(tmp_path):
    """A later stage introducing metrics (flow losses, first val split)
    must WIDEN history.csv, not silently drop the new columns."""
    logger = TrainingLogger(tmp_path)
    logger.save_log(0, {"loss": 1.0}, {})
    logger.save_log(1, {"loss": 0.9, "loss_flowL2": 0.1}, {"loss": 0.8})
    lines = (tmp_path / "history.csv").read_text().strip().splitlines()
    header = lines[0].split(",")
    assert "train_loss_flowL2" in header and "val_loss" in header
    # epoch-0 row padded with empties to the widened header
    assert len(lines[1].split(",")) == len(header)
    row1 = dict(zip(header, lines[2].split(",")))
    assert float(row1["train_loss_flowL2"]) == 0.1
    assert float(row1["val_loss"]) == 0.8
