"""Sanity: the real train step (default Pallas fast warp) reduces the
loss on the TPU chip. Catches numeric breakage that throughput
benchmarks would miss.

Run: python benchmarks/check_train_converges_tpu.py
     NET=EfficientNetB0 python benchmarks/check_train_converges_tpu.py
         (flagship pretrained path: backbone BN + packed decoder tail)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from xpt_mde_tpu import config as cfg
    from xpt_mde_tpu.losses import loss_factory
    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training import (create_train_state, make_train_step,
                                      optimizer_factory)

    batch, height, width = 4, 128, 512
    rng = np.random.RandomState(0)
    # structured synthetic scene: smooth gradient images so photometric
    # loss has signal to descend
    base = np.linspace(-1, 1, width, dtype=np.float32)[None, :, None]
    img = np.broadcast_to(base, (height, width, 3)).copy()
    img += rng.rand(height, width, 3).astype(np.float32) * 0.1
    image5d = np.broadcast_to(img, (batch, 5, height, width, 3))
    features = {
        "image5d": jnp.asarray(image5d),
        "intrinsic": jnp.asarray(np.tile(np.array(
            [[358.0, 0, width / 2], [0, 370.0, height / 2], [0, 0, 1]],
            np.float32), (batch, 1, 1))),
    }
    import os
    depth_net = os.environ.get("NET", "DepthNetBasic")
    factory = ModelFactory(["image", "intrinsic"],
                           {"depth": depth_net,
                            "camera": "PoseNetImproved"},
                           stereo=False, high_res=False,
                           compute_dtype="bfloat16")
    model = factory.get_model()
    total_loss = loss_factory(["image", "intrinsic"],
                              {"L1": 1.0, "smoothe": 1.0},
                              cfg.SCALE_WEIGHT_T1, stereo=False,
                              batch_size=batch)
    tx = optimizer_factory("adam_constant", 1e-4)
    state = create_train_state(model, features, tx)
    step = make_train_step(model, total_loss)

    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, features, sub)
        if i % 5 == 0 or i == 29:
            losses.append(float(metrics["loss"]))
    print("losses:", " ".join(f"{v:.4f}" for v in losses), flush=True)
    ok = (np.isfinite(losses).all() and losses[-1] < losses[0])
    print(f"converges: {ok} (first={losses[0]:.4f} last={losses[-1]:.4f})",
          flush=True)


if __name__ == "__main__":
    main()
