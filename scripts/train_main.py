"""Training entry point (the reference's model/model_main.py role).

Zero CLI flags by design (README.md:30-37 philosophy): edit
``scripts/user_config.py`` (copied from user_config_example.py) and run

    python scripts/train_main.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_user_config():
    try:
        from scripts.user_config import cfg  # type: ignore
        return cfg
    except ImportError:
        from xpt_mde_tpu.config import Config
        print("[train_main] no scripts/user_config.py; using defaults "
              "(copy scripts/user_config_example.py)")
        return Config()


def main():
    from xpt_mde_tpu.evaluate.evaluate_main import predict_by_plan
    from xpt_mde_tpu.training.trainer import train_by_plan

    cfg = load_user_config()
    mesh = None
    import jax
    if len(jax.devices()) > 1:
        from xpt_mde_tpu.parallel import make_mesh
        mesh = make_mesh()
        print(f"[train_main] data-parallel over {mesh.devices.size} devices")
    train_by_plan(cfg, mesh=mesh)
    if cfg.test_plan:
        predict_by_plan(cfg)


if __name__ == "__main__":
    main()
