"""Depth-comparison viz entry point (the reference's
evaluate/compare_depth_main.py role): side-by-side colormapped
disparity panels — input image | our prediction | any external
methods' precomputed results — for every TEST_PLAN stage.
Zero CLI flags; configure in scripts/user_config.py (set
``cfg.external_disparities = {"monodepth2": "/path/disps.npy", ...}``
to add comparison columns, mirroring config-example.py:257-260).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from scripts.train_main import load_user_config
    from xpt_mde_tpu.evaluate.visualize import compare_depths

    cfg = load_user_config()
    external = getattr(cfg, "external_disparities", None)
    for stage in cfg.test_plan:
        npz = (Path(cfg.datapath_prd) / stage.ckpt_name
               / f"{stage.dataset}_{stage.weight_suffix}.npz")
        if not npz.exists():
            print(f"[compare_depth] no predictions: {npz}")
            continue
        out_dir = (Path(cfg.datapath_evl) / stage.ckpt_name
                   / f"depth_compare_{stage.dataset}")
        compare_depths(npz, out_dir, external_disparities=external)
        print(f"[compare_depth] wrote {out_dir}")


if __name__ == "__main__":
    main()
