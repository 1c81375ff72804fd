"""Benchmark: flagship self-supervised train-step throughput on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec", "vs_baseline": N}

Config mirrors the reference's headline training stage (SURVEY.md §6):
EfficientNetB5 DepthNet + PoseNetImproved, KITTI low-res 128x512 5-frame
snippets, photometric L1+SSIM + edge-aware smoothness, Adam -- the full
jitted train step (forward + 4-scale synthesis + losses + backward +
update) in bfloat16 compute.

vs_baseline: the reference publishes NO throughput (BASELINE.md), so the
baseline constant below is an estimate of the TF2.4 single-GPU pipeline
on 2021 hardware for this exact stage (EfficientNetB5, batch-per-step
time dominated by eager-ish graph + per-step host sync, ~8 images/sec).
The BASELINE.json target is >=3x that, i.e. vs_baseline >= 3.0.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TF2_GPU_IMAGES_PER_SEC_ESTIMATE = 8.0

import os as _os
BATCH = int(_os.environ.get("BENCH_BATCH", 8))
HEIGHT = int(_os.environ.get("BENCH_HEIGHT", 128))
WIDTH = int(_os.environ.get("BENCH_WIDTH", 512))
WARMUP_STEPS = 3
MEASURE_STEPS = 10


def main():
    from xpt_mde_tpu import config as cfg
    from xpt_mde_tpu.losses import loss_factory
    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training import (create_train_state, make_train_step,
                                      optimizer_factory)

    rng = np.random.RandomState(0)
    features = {
        "image5d": jnp.asarray(
            rng.rand(BATCH, 5, HEIGHT, WIDTH, 3).astype(np.float32) * 2 - 1),
        "intrinsic": jnp.asarray(np.tile(np.array(
            [[358.0, 0, WIDTH / 2], [0, 370.0, HEIGHT / 2], [0, 0, 1]],
            np.float32), (BATCH, 1, 1))),
    }

    factory = ModelFactory(["image", "intrinsic"],
                           {"depth": "EfficientNetB5",
                            "camera": "PoseNetImproved"},
                           stereo=False, compute_dtype="bfloat16")
    model = factory.get_model()
    total_loss = loss_factory(["image", "intrinsic"],
                              {"L1": 0.5, "SSIM": 0.5, "smoothe": 20.0},
                              cfg.SCALE_WEIGHT_T1, stereo=False,
                              batch_size=BATCH)
    tx = optimizer_factory("adam_constant", 1e-4)
    state = create_train_state(model, features, tx)
    step = make_train_step(model, total_loss)

    step_rng = jax.random.PRNGKey(0)
    for i in range(WARMUP_STEPS):
        step_rng, sub = jax.random.split(step_rng)
        state, metrics = step(state, features, sub)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        step_rng, sub = jax.random.split(step_rng)
        state, metrics = step(state, features, sub)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * MEASURE_STEPS / dt
    print(json.dumps({
        "metric": f"train_images_per_sec_per_chip_effb5_{HEIGHT}x{WIDTH}",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / TF2_GPU_IMAGES_PER_SEC_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    main()
