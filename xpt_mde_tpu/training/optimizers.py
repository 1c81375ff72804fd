"""Optimizer factory with per-net trainability masks.

Reference semantics (/root/reference/model/model_util/optimizers.py:7-13,
model_main.py:88-90): constant-LR Adam or SGD per training stage; in
joint stages the flownet is frozen. Freezing is functional here: a
``zero_grads`` mask keyed by top-level param groups (``depthnet``,
``posenet``, ``flownet``).
"""

from __future__ import annotations

from typing import Sequence

import optax


def optimizer_factory(name: str, learning_rate: float,
                      frozen_nets: Sequence[str] = ()) -> optax.GradientTransformation:
    if name in ("adam", "adam_constant"):
        opt = optax.adam(learning_rate)
    elif name in ("sgd", "sgd_constant"):
        opt = optax.sgd(learning_rate)
    else:
        raise ValueError(f"invalid optimizer: {name}")

    if frozen_nets:
        frozen = set(frozen_nets)

        def label_fn(params):
            return {k: ("frozen" if k in frozen else "train")
                    for k in params.keys()}

        opt = optax.multi_transform(
            {"train": opt, "frozen": optax.set_to_zero()}, label_fn)
    return opt
