"""Raw-uint8 loader path: device-side decode must equal host decode.

The trainer ships uint8 snippets and decodes inside the jitted steps
(training.train_step.decode_image_features); these tests pin that the
two decodes are bit-identical and that a train step accepts uint8
batches transparently.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from xpt_mde_tpu.data.shard_io import (DatasetLoader, ShardDataset,
                                       ShardWriter, merge_drive_dirs)
from xpt_mde_tpu.training.train_step import decode_image_features


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw_loader")
    rng = np.random.RandomState(0)
    drive = root / "drive0"
    with ShardWriter(drive, frames_per_shard=8) as writer:
        for _ in range(12):
            writer.write({
                "image": rng.randint(0, 256, (5 * 16, 48, 3), np.uint8),
                "intrinsic": np.eye(3, dtype=np.float32),
            })
        writer.write_config({"dataset": "raw_test"})
    dest = root / "raw_test_train"
    merge_drive_dirs([drive], dest)
    return dest


def test_device_decode_matches_host(shard_dir):
    kw = dict(batch_size=4, snippet_len=5, shuffle=False, seed=0)
    host = next(iter(DatasetLoader(ShardDataset(shard_dir), **kw)))
    raw = next(iter(DatasetLoader(ShardDataset(shard_dir),
                                  raw_images=True, **kw)))
    assert raw["image5d"].dtype == np.uint8
    decoded = decode_image_features(
        {k: jnp.asarray(v) for k, v in raw.items()})
    assert decoded["image5d"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(decoded["image5d"]),
                                  host["image5d"])
    # float batches pass through untouched
    again = decode_image_features(decoded)
    assert again["image5d"] is decoded["image5d"]


def test_train_step_accepts_uint8(shard_dir):
    import jax

    from xpt_mde_tpu import config as cfg
    from xpt_mde_tpu.losses import loss_factory
    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training import (create_train_state, make_train_step,
                                      optimizer_factory)

    kw = dict(batch_size=4, snippet_len=5, shuffle=False, seed=0)
    host = next(iter(DatasetLoader(ShardDataset(shard_dir), **kw)))
    raw = next(iter(DatasetLoader(ShardDataset(shard_dir),
                                  raw_images=True, **kw)))
    host = {k: jnp.asarray(v) for k, v in host.items()}
    raw = {k: jnp.asarray(v) for k, v in raw.items()}

    model = ModelFactory(["image", "intrinsic"],
                         {"depth": "DepthNetBasic",
                          "camera": "PoseNetImproved"},
                         stereo=False).get_model()
    total_loss = loss_factory(["image", "intrinsic"], {"L1": 1.0},
                              cfg.SCALE_WEIGHT_T1, stereo=False,
                              batch_size=4)
    tx = optimizer_factory("adam_constant", 1e-4)
    step = make_train_step(model, total_loss, jit=False)

    rng = jax.random.PRNGKey(0)
    state_a = create_train_state(model, decode_image_features(raw), tx)
    state_b = create_train_state(model, host, tx)
    _, metrics_raw = step(state_a, raw, rng)
    _, metrics_host = step(state_b, host, rng)
    assert np.allclose(float(metrics_raw["loss"]),
                       float(metrics_host["loss"]), rtol=0, atol=0)
