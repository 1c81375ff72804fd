"""Dataset preparation entry point (the reference's
tfrecords/create_tfrecords_main.py role): convert raw datasets into
fixed-record shards + validation splits. Zero CLI flags; configure in
scripts/user_config.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from scripts.train_main import load_user_config
    from xpt_mde_tpu.data.shard_maker import convert_to_shards

    cfg = load_user_config()
    try:
        from scripts.user_config import RAW_DATA_PATHS  # type: ignore
    except ImportError:
        from scripts.user_config_example import RAW_DATA_PATHS
    datasets = {name: (["train", "test"] if name.startswith("kitti")
                       else ["train"])
                for name in RAW_DATA_PATHS}
    convert_to_shards(cfg, RAW_DATA_PATHS, datasets)


if __name__ == "__main__":
    main()
