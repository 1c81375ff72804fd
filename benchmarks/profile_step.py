"""Trace the full train step on the TPU and print the top device ops.

Uses jax.profiler + the trace-viewer JSON (works without the xprof UI).

    python benchmarks/profile_step.py [trace_dir]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def top_ops(trace_dir: str, top: int = 25):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace json found")
        return
    data = json.loads(gzip.open(sorted(files)[-1]).read())
    durs: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            durs[name] += e["dur"]
            counts[name] += 1
    print(f"{'total ms':>10}  {'count':>5}  op")
    for name, d in durs.most_common(top):
        print(f"{d / 1e3:10.2f}  {counts[name]:5}  {name[:100]}")


def main(trace_dir: str = "/tmp/xprof_step_trace"):
    from xpt_mde_tpu import config as cfg
    from xpt_mde_tpu.losses import loss_factory
    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training import (create_train_state, make_train_step,
                                      optimizer_factory)

    import os
    batch = int(os.environ.get("BENCH_BATCH", 8))
    height = int(os.environ.get("BENCH_HEIGHT", 128))
    width = int(os.environ.get("BENCH_WIDTH", 512))
    rng = np.random.RandomState(0)
    features = {
        "image5d": jnp.asarray(
            rng.rand(batch, 5, height, width, 3).astype(np.float32) * 2 - 1),
        "intrinsic": jnp.asarray(np.tile(np.array(
            [[358.0, 0, width / 2], [0, 370.0, height / 2], [0, 0, 1]],
            np.float32), (batch, 1, 1))),
    }
    model = ModelFactory(["image", "intrinsic"],
                         {"depth": "EfficientNetB5",
                          "camera": "PoseNetImproved"},
                         stereo=False, compute_dtype="bfloat16").get_model()
    total_loss = loss_factory(["image", "intrinsic"],
                              {"L1": 0.5, "SSIM": 0.5, "smoothe": 20.0},
                              cfg.SCALE_WEIGHT_T1, stereo=False,
                              batch_size=batch)
    state = create_train_state(model, features,
                               optimizer_factory("adam_constant", 1e-4))
    step = make_train_step(model, total_loss)

    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, metrics = step(state, features, sub)
    jax.block_until_ready(metrics["loss"])

    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, metrics = step(state, features, sub)
        jax.block_until_ready(metrics["loss"])
    top_ops(trace_dir)


if __name__ == "__main__":
    if len(sys.argv) > 1 and Path(sys.argv[1]).exists():
        top_ops(sys.argv[1])
    else:
        main()
