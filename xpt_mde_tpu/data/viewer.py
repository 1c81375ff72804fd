"""Example debug viewer: eyeball one training example.

Mirrors the reference's tfr_util.py:188-221 (``apply_color_map`` +
``show_example``): image / right image / viridis depth panels, optional
intrinsic+pose printout. Headless-first: panels are *returned* (and
optionally written to ``save_dir``); ``wait >= 0`` additionally pops
cv2.imshow windows like the reference when a display exists.

Works on examples from ExampleMaker (uint8 stacked snippet images) and
on decoded loader rows.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def apply_color_map(depth: np.ndarray, max_depth: float = 50.0):
    """Depth map -> viridis BGR view; invalid (zero) pixels black
    (tfr_util.py:188-194)."""
    import cv2

    depth = np.squeeze(np.asarray(depth))
    if depth.ndim > 2:
        depth = depth[..., 0]
    view = (np.clip(depth, 0, max_depth) / max_depth * 255).astype(np.uint8)
    view = cv2.applyColorMap(view, cv2.COLORMAP_VIRIDIS)
    view[depth == 0, :] = (0, 0, 0)
    return view


def _to_u8(image: np.ndarray) -> np.ndarray:
    image = np.asarray(image)
    if image.dtype == np.uint8:
        return image
    # float convention is [-1, 1] (util_funcs.py:79-86)
    return ((np.clip(image, -1, 1) + 1) / 2 * 255).astype(np.uint8)


def show_example(example: dict, wait: int = -1, print_param: bool = False,
                 max_height: int = 1000, suffix: str = "",
                 save_dir=None) -> dict:
    """Build (and optionally display/save) debug panels for one example.

    :param example: {"image": [H*S, W, 3] or [S, H, W, 3], optional
        "image_R", "depth_gt", "intrinsic", "pose_gt"}
    :param wait: cv2.waitKey delay; < 0 skips imshow entirely (headless)
    :param save_dir: when set, panels are written there as pngs
    :return: {panel_name: uint8 BGR array}
    """
    import cv2

    panels = {}
    for key, name in (("image", "image"), ("image_R", "image_R")):
        if example.get(key) is None:
            continue
        img = _to_u8(example[key])
        if img.ndim == 4:  # [S, H, W, 3] snippet -> vertical stack
            img = img.reshape(-1, img.shape[-2], img.shape[-1])
        if max_height and img.shape[0] > max_height:
            w = int(img.shape[1] * max_height / img.shape[0])
            img = cv2.resize(img, (w, max_height))
        panels[name + suffix] = img
    if example.get("depth_gt") is not None:
        panels["depth" + suffix] = apply_color_map(example["depth_gt"])

    if print_param:
        print("\nintrinsic:\n", np.asarray(example["intrinsic"]))
        if example.get("pose_gt") is not None:
            from xpt_mde_tpu.utils import se3
            print("pose\n", np.asarray(
                se3.matrix_to_twist_np(np.asarray(example["pose_gt"]))))

    if save_dir is not None:
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        for name, panel in panels.items():
            cv2.imwrite(str(save_dir / f"{name}.png"), panel)
    if wait >= 0:
        for name, panel in panels.items():
            cv2.imshow(name, panel)
        cv2.waitKey(wait)
    return panels
