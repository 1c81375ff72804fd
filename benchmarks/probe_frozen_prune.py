"""A/B probe: joint-stage step with vs without frozen-flownet backward
pruning (stop_gradient on the frozen param group), same process, same
chip, interleaved measurement -- isolates the pruning effect from the
axon tunnel's run-to-run variance.

Usage: python benchmarks/probe_frozen_prune.py
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from xpt_mde_tpu.training import (create_train_state, make_train_step,
                                  optimizer_factory)


def time_step(step, state, features, rng, n=20):
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, features, rng)
    float(metrics["loss"])  # host fetch = the only real sync on axon
    return (time.perf_counter() - t0) / n, state


def main():
    model, total_loss, features, step_kwargs = bench.build_stage("joint")
    tx = optimizer_factory("adam_constant", 1e-4, frozen_nets=["flownet"])
    rng = jax.random.PRNGKey(0)

    steps = {
        "masked": make_train_step(model, total_loss),
        "pruned": make_train_step(model, total_loss, frozen_nets=["flownet"]),
    }
    states = {k: create_train_state(model, features, tx) for k in steps}

    # warm both compiles first
    for k, step in steps.items():
        t0 = time.perf_counter()
        states[k], m = step(states[k], features, rng)
        float(m["loss"])
        print(f"{k}: compile+1st step {time.perf_counter() - t0:.1f}s")

    # interleave rounds so contention hits both equally
    batch = features["image5d"].shape[0]
    for rnd in range(3):
        for k, step in steps.items():
            dt, states[k] = time_step(step, states[k], features, rng)
            print(f"round {rnd} {k}: {dt * 1e3:7.2f} ms/step "
                  f"({batch / dt:6.1f} img/s)")


if __name__ == "__main__":
    main()
