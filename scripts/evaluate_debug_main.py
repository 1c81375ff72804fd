"""Deep-inspection evaluation entry point (the reference's
evaluate/evaluate_debug.py role): per-frame metric csvs and worst-frame
image dumps for every TEST_PLAN row with saved predictions. Zero CLI
flags; configure in scripts/user_config.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from scripts.train_main import load_user_config
    from xpt_mde_tpu.evaluate.evaluate_debug import evaluate_for_debug

    cfg = load_user_config()
    for stage in cfg.test_plan:
        npz = (Path(cfg.datapath_prd) / stage.ckpt_name
               / f"{stage.dataset}_{stage.weight_suffix}.npz")
        if not npz.exists():
            print(f"[evaluate_debug] no predictions: {npz}")
            continue
        debug_dir = (Path(cfg.datapath_evl) / stage.ckpt_name
                     / f"debug_{stage.dataset}_{stage.weight_suffix}")
        out = evaluate_for_debug(npz, debug_dir)
        print(f"[evaluate_debug] {stage.ckpt_name}: {len(out['rows'])} frames,"
              f" worst dumped for {list(out['worst'])}")


if __name__ == "__main__":
    main()
