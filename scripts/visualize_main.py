"""3D visualization entry point (the reference's
evaluate/visualize_main.py role): Open3D point-cloud overlay of
predicted vs GT depth for TEST_PLAN predictions. Gated on open3d
being importable (it is a viz-only optional dependency).
Zero CLI flags; configure in scripts/user_config.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from scripts.train_main import load_user_config
    from xpt_mde_tpu.evaluate.visualize import visualize_point_cloud

    cfg = load_user_config()
    for stage in cfg.test_plan:
        npz = (Path(cfg.datapath_prd) / stage.ckpt_name
               / f"{stage.dataset}_{stage.weight_suffix}.npz")
        if not npz.exists():
            print(f"[visualize] no predictions: {npz}")
            continue
        print(f"[visualize] {npz} (close the window to advance)")
        visualize_point_cloud(npz)


if __name__ == "__main__":
    main()
