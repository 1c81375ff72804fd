"""Train-step time breakdown on the real chip: forward / forward+loss /
full step. Guides kernel-level optimization (which third dominates).

    python benchmarks/step_breakdown.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

BATCH, HEIGHT, WIDTH = 8, 128, 512


def timeit(fn, *args, warmup=2, iters=10):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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
    model = ModelFactory(["image", "intrinsic"],
                         {"depth": "EfficientNetB5",
                          "camera": "PoseNetImproved"},
                         stereo=False, compute_dtype="bfloat16").get_model()
    total_loss = loss_factory(["image", "intrinsic"],
                              {"L1": 0.5, "SSIM": 0.5, "smoothe": 20.0},
                              cfg.SCALE_WEIGHT_T1, stereo=False,
                              batch_size=BATCH)
    tx = optimizer_factory("adam_constant", 1e-4)
    state = create_train_state(model, features, tx)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def forward_only(variables, features):
        return model.apply(variables, features, train=False)

    @jax.jit
    def forward_loss(variables, features):
        preds = model.apply(variables, features, train=False)
        loss, _ = total_loss(preds, features)
        return loss

    step = make_train_step(model, total_loss)

    t_fwd = timeit(forward_only, variables, features)
    print(json.dumps({"metric": "effb5_forward_ms",
                      "value": round(t_fwd * 1e3, 2), "unit": "ms"}))
    t_fl = timeit(forward_loss, variables, features)
    print(json.dumps({"metric": "effb5_forward_loss_ms",
                      "value": round(t_fl * 1e3, 2), "unit": "ms"}))

    def run_step(state, features):
        return step(state, features, jax.random.PRNGKey(0))

    # full step donates state; re-time manually
    for _ in range(2):
        state, metrics = run_step(state, features)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, metrics = run_step(state, features)
    jax.block_until_ready(metrics["loss"])
    t_full = (time.perf_counter() - t0) / iters
    print(json.dumps({"metric": "effb5_full_step_ms",
                      "value": round(t_full * 1e3, 2), "unit": "ms",
                      "loss_overhead_ms": round((t_fl - t_fwd) * 1e3, 2),
                      "backward_update_ms": round((t_full - t_fl) * 1e3, 2)}))


if __name__ == "__main__":
    main()
