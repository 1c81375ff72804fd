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


def top_ops(trace_dir: str, top: int = 25, steps: int = 3):
    """Aggregate DEVICE-track leaf ops (those carrying an hlo_category)
    by category, source file:line, and op name; ms are per step."""
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace json found")
        return
    data = json.loads(gzip.open(sorted(files)[-1]).read())
    device_pids = {
        e["pid"] for e in data.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device:" in e.get("args", {}).get("name", "")
        and "CPU" not in e["args"]["name"]}
    durs: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    cats: collections.Counter = collections.Counter()
    srcs: collections.Counter = collections.Counter()
    total = 0.0
    for e in data.get("traceEvents", []):
        if (e.get("ph") != "X" or "dur" not in e
                or e.get("pid") not in device_pids):
            continue
        args = e.get("args", {})
        if "hlo_category" not in args:
            continue  # module/step parent spans double-count their children
        name = e.get("name", "?")
        durs[name] += e["dur"]
        counts[name] += 1
        cats[args["hlo_category"]] += e["dur"]
        srcs[args.get("source_info") or args.get("source") or "?"] += e["dur"]
        total += e["dur"]
    scale = 1e3 * steps
    print(f"device total: {total / scale:.2f} ms/step (over {steps} steps)")
    print("\n--- by hlo_category (ms/step) ---")
    for k, v in cats.most_common(15):
        print(f"{v / scale:8.2f}  {k}")
    print("\n--- by source (ms/step) ---")
    for k, v in srcs.most_common(20):
        print(f"{v / scale:8.2f}  {k}")
    print(f"\n--- top ops (ms/step) ---")
    for name, d in durs.most_common(top):
        print(f"{d / scale:8.2f}  x{counts[name] // steps:<4d} {name[:100]}")


def main(trace_dir: str = "/tmp/xprof_step_trace"):
    from xpt_mde_tpu.training import (create_train_state, make_train_step,
                                      optimizer_factory)

    import os
    import bench  # repo-root bench.py: the stage being profiled IS the
    #               benchmarked program (BENCH_STAGE/BATCH/HEIGHT/WIDTH)
    model, total_loss, features, step_kwargs = bench.build_stage()
    print(f"profiling stage={os.environ.get('BENCH_STAGE', 'rigid')} "
          f"batch={features['image5d'].shape[0]} "
          f"hw={features['image5d'].shape[2:4]}")
    state = create_train_state(
        model, features,
        optimizer_factory("adam_constant", 1e-4,
                          frozen_nets=step_kwargs.get("frozen_nets", ())))
    step = make_train_step(model, total_loss, **step_kwargs)

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
