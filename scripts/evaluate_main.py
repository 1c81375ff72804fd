"""Evaluation entry point (the reference's evaluate/evaluate_main.py
role): run depth/pose metrics over saved predictions per TEST_PLAN.
Zero CLI flags; configure in scripts/user_config.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from scripts.train_main import load_user_config
    from xpt_mde_tpu.evaluate.evaluate_main import evaluate_by_plan

    cfg = load_user_config()
    evaluate_by_plan(cfg)


if __name__ == "__main__":
    main()
