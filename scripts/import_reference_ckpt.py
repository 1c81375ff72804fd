"""Convert reference (goodgodgd/xpt-mde-2021) H5 checkpoints to msgpack.

The reference trains into per-net keras H5 files
({depthnet,posenet,flownet}_{latest|epNN}.h5, model_wrappers.py:101-117).
Point this tool at such a checkpoint directory and it writes the
equivalent per-net msgpack checkpoints that scripts/train_main.py /
predict_by_plan load -- trained reference models carry over without
retraining (see MIGRATION.md).

Zero CLI flags like every other entry point: set the three variables in
scripts/user_config.py (or rely on the defaults below), e.g.

    import_src = "/path/to/reference/checkpts/vode1/ckpt"
    import_dst = None            # default: <datapath>/checkpts/<ckpt_name>
    import_suffix = "latest"     # or "ep20", ...

The net set is the FINAL training-plan stage's net_names (the reference
loads checkpoints with the same selective per-net rule).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.train_main import load_user_config  # noqa: E402


def main():
    from xpt_mde_tpu.training.import_reference import \
        import_reference_checkpoint

    cfg = load_user_config()
    src = getattr(cfg, "import_src", None)
    if not src:
        print("set cfg.import_src to the reference ckpt dir "
              "(contains {net}_{suffix}.h5 files)")
        return 1
    dst = getattr(cfg, "import_dst", None) or \
        Path(cfg.datapath) / "checkpts" / cfg.ckpt_name
    suffix = getattr(cfg, "import_suffix", "latest")
    if not cfg.training_plan:
        print("empty training plan; cannot infer net_names")
        return 1
    stage = cfg.training_plan[-1]
    dataset = stage.dataset
    imported = import_reference_checkpoint(
        src, dst, cfg, stage.net_names, suffix=suffix, dataset=dataset)
    print(f"[import] done: {imported} -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
