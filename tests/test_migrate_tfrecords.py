"""TFRecord -> shard migration test.

Builds a miniature reference-format TFRecord dir (the Serializer +
tfr_config.txt layout of /root/reference/tfrecords/tfr_util.py:8-77) and
migrates it, asserting byte-exact example round-trip.
"""

import json

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from xpt_mde_tpu.data.migrate_tfrecords import migrate  # noqa: E402
from xpt_mde_tpu.data.shard_io import ShardDataset  # noqa: E402


def _bytes_feature(arr):
    return tf.train.Feature(
        bytes_list=tf.train.BytesList(value=[arr.tobytes()]))


@pytest.fixture()
def reference_tfrecords(tmp_path):
    rng = np.random.RandomState(0)
    tfr_dir = tmp_path / "kitti_raw_train"
    tfr_dir.mkdir()
    examples = []
    with tf.io.TFRecordWriter(str(tfr_dir / "shard_000.tfrecord")) as writer:
        for i in range(5):
            ex = {
                "image": rng.randint(0, 255, (5 * 16, 32, 3), np.uint8),
                "intrinsic": rng.rand(3, 3).astype(np.float32),
                "pose_gt": rng.rand(4, 4, 4).astype(np.float32),
            }
            examples.append(ex)
            features = tf.train.Features(feature={
                k: _bytes_feature(v) for k, v in ex.items()})
            writer.write(tf.train.Example(
                features=features).SerializeToString())

    config = {
        "image": {"parse_type": "tf.string", "decode_type": "tf.uint8",
                  "shape": [5 * 16, 32, 3]},
        "intrinsic": {"parse_type": "tf.string", "decode_type": "tf.float32",
                      "shape": [3, 3]},
        "pose_gt": {"parse_type": "tf.string", "decode_type": "tf.float32",
                    "shape": [4, 4, 4]},
        "length": 5,
        "imshape": [5, 16, 32, 3],
    }
    (tfr_dir / "tfr_config.txt").write_text(json.dumps(config))
    return tfr_dir, examples


def test_migration_roundtrip(reference_tfrecords, tmp_path):
    tfr_dir, examples = reference_tfrecords
    out = migrate(tfr_dir, tmp_path / "shards" / "kitti_raw_train")
    ds = ShardDataset(out)
    assert len(ds) == 5
    assert ds.config.get("imshape") == [5, 16, 32, 3]
    for i, ex in enumerate(examples):
        back = ds.read_example(i)
        for key, val in ex.items():
            assert np.array_equal(back[key], val), key
    # idempotent
    assert migrate(tfr_dir, out) == out
