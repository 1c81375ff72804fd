"""Deep-inspection evaluation entry point (the reference's
evaluate/evaluate_debug.py role): per-frame metric csvs, trajectory.csv
and worst-frame inspection dumps for every TEST_PLAN row with a saved
checkpoint. Zero CLI flags; configure in scripts/user_config.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from scripts.train_main import load_user_config
    from xpt_mde_tpu.evaluate.evaluate_debug import debug_by_plan

    debug_by_plan(load_user_config())


if __name__ == "__main__":
    main()
