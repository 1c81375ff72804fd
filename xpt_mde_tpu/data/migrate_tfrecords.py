"""Migrate reference-framework TFRecords into native shards.

Users of the reference (goodgodgd/xpt-mde-2021) hold datasets as
TFRecord dirs with a ``tfr_config.txt`` schema
(/root/reference/tfrecords/tfrecord_maker.py:141-151 writes it;
tfrecord_reader.py:20-59 parses it). This tool reads those dirs with
tf.data (TensorFlow CPU is only needed at migration time) and rewrites
them as fixed-record shards, so existing prepared datasets work without
re-running data prep.

    python -m xpt_mde_tpu.data.migrate_tfrecords <tfrecord_dir> <shard_dir>
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

from xpt_mde_tpu.data.shard_io import ShardWriter
from xpt_mde_tpu.utils.util_class import PathManager


def read_tfr_config(tfrecord_dir) -> dict:
    return json.loads((Path(tfrecord_dir) / "tfr_config.txt").read_text())


def iterate_tfrecord_examples(tfrecord_dir):
    """Yield feature dicts from a reference TFRecord dir."""
    import tensorflow as tf

    config = read_tfr_config(tfrecord_dir)
    feature_keys = {k: v for k, v in config.items()
                    if isinstance(v, dict) and "parse_type" in v}

    def parse(example):
        spec = {}
        for key, info in feature_keys.items():
            if info["parse_type"] == "tf.string":
                spec[key] = tf.io.FixedLenFeature((), tf.string)
            else:
                spec[key] = tf.io.FixedLenFeature((), tf.int64)
        return tf.io.parse_single_example(example, spec)

    files = sorted(str(p) for p in Path(tfrecord_dir).glob("*.tfrecord"))
    dataset = tf.data.TFRecordDataset(files)
    for raw in dataset:
        parsed = parse(raw)
        out = {}
        dtypes = {"tf.uint8": tf.uint8, "tf.float32": tf.float32}
        for key, info in feature_keys.items():
            if info["parse_type"] == "tf.string":
                decoded = tf.io.decode_raw(parsed[key],
                                           dtypes[info["decode_type"]])
                out[key] = np.asarray(decoded).reshape(info["shape"])
            else:
                out[key] = np.asarray(parsed[key])
        yield out


def migrate(tfrecord_dir, shard_dir, frames_per_shard: int = 2000) -> Path:
    """Convert one TFRecord dir into a shard dir (atomic)."""
    shard_dir = Path(shard_dir)
    if shard_dir.exists():
        print(f"[migrate] exists, skip: {shard_dir}")
        return shard_dir
    config = read_tfr_config(tfrecord_dir)
    tmp = shard_dir.parent / (shard_dir.name + "__tmp")
    with PathManager(tmp) as pm:
        with ShardWriter(tmp, frames_per_shard) as writer:
            for example in iterate_tfrecord_examples(tfrecord_dir):
                writer.write(example)
            extra = {k: v for k, v in config.items()
                     if not isinstance(v, dict)}
            writer.write_config(extra)
        pm.set_ok()
    tmp.rename(shard_dir)
    print(f"[migrate] {tfrecord_dir} -> {shard_dir} "
          f"({ShardWriter.__name__} count)")
    return shard_dir


if __name__ == "__main__":
    migrate(sys.argv[1], sys.argv[2])
