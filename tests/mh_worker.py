"""Subprocess worker for tests/test_multihost.py.

Runs as one process of a 2-process CPU "pod" (Gloo collectives):

    python mh_worker.py <step|plan> <process_id> <num_processes> <port> \
        <devs_per_proc> [<workdir>]

``step`` mode: one DP train step over the global host-major mesh on a
deterministic synthetic batch; prints ``MHLOSS <loss>`` for the parent
to compare against its single-process reference.

``plan`` mode: a full 1-epoch ``train_by_plan`` over the multihost mesh
into <workdir> — exercises the per-process loader slicing, the
process-local->global batch assembly and the main-process-only IO
guards; prints ``MHPLAN <train_loss>``.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _global_batch():
    import jax.numpy as jnp

    from xpt_mde_tpu.data import SyntheticDataset
    data = SyntheticDataset(batch_size=8, height=32, width=64,
                            num_batches=1, stereo=True, seed=7)
    return {k: jnp.asarray(v) for k, v in next(iter(data)).items()}, data


def reference_loss():
    """Single-process 8-device (loss, batch checksum) for the same step
    (run by the parent pytest process on its conftest CPU backend)."""
    import jax
    import jax.numpy as jnp

    from xpt_mde_tpu import config as cfg
    from xpt_mde_tpu.losses import loss_factory
    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.parallel import (make_mesh, make_parallel_train_step,
                                      replicate_state, shard_batch)
    from xpt_mde_tpu.training import create_train_state, optimizer_factory

    batch, data = _global_batch()
    mesh = make_mesh({"data": 8}, devices=jax.devices()[:8])
    model = ModelFactory(data.config_keys(),
                         {"depth": "DepthNetBasic",
                          "camera": "PoseNetImproved"},
                         stereo=True, compute_dtype="float32").get_model()
    total_loss = loss_factory(data.config_keys(), dict(cfg.LOSS_RIGID_T2),
                              cfg.SCALE_WEIGHT_T1, stereo=True, batch_size=8)
    tx = optimizer_factory("adam_constant", 1e-4)
    state = replicate_state(create_train_state(model, batch, tx), mesh)
    step = make_parallel_train_step(model, total_loss, mesh)
    _, metrics = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(0))
    checksum = float(jnp.abs(batch["image5d"]).sum())
    return float(metrics["loss"]), checksum


def _couple(process_id: int, num_processes: int, port: int,
            devs_per_proc: int):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", devs_per_proc)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from xpt_mde_tpu.parallel import multihost
    # this host may have a single core: simultaneous worker compiles
    # starve the heartbeat thread, so stretch every liveness deadline
    multihost.initialize(f"localhost:{port}", num_processes, process_id,
                         initialization_timeout=600,
                         heartbeat_timeout_seconds=900,
                         shutdown_timeout_seconds=1200)
    assert jax.process_count() == num_processes
    assert jax.local_device_count() == devs_per_proc
    # form the all-device Gloo clique NOW with a trivial barrier: its
    # compile is ~instant on every process, so the 30s context
    # rendezvous deadline can't be blown by compile-time skew on the
    # real (minutes-long) train-step program, which then reuses the
    # established clique
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("gloo_warmup")
    return jax


def step_mode(process_id: int, num_processes: int, port: int,
              devs_per_proc: int):
    jax = _couple(process_id, num_processes, port, devs_per_proc)

    from xpt_mde_tpu import config as cfg
    from xpt_mde_tpu.losses import loss_factory
    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.parallel import (make_parallel_train_step,
                                      replicate_state, shard_batch)
    from xpt_mde_tpu.parallel.multihost import make_multihost_mesh
    from xpt_mde_tpu.training import create_train_state, optimizer_factory

    batch, data = _global_batch()
    # this process's rows of the global batch (host-major mesh => global
    # row order is process-major, matching shard_batch's assembly)
    nloc = 8 // num_processes
    local = {k: v[process_id * nloc:(process_id + 1) * nloc]
             for k, v in batch.items()}

    mesh = make_multihost_mesh({"data": 8})
    model = ModelFactory(data.config_keys(),
                         {"depth": "DepthNetBasic",
                          "camera": "PoseNetImproved"},
                         stereo=True, compute_dtype="float32").get_model()
    total_loss = loss_factory(data.config_keys(), dict(cfg.LOSS_RIGID_T2),
                              cfg.SCALE_WEIGHT_T1, stereo=True, batch_size=8)
    tx = optimizer_factory("adam_constant", 1e-4)
    global_batch = shard_batch(local, mesh)
    assert global_batch["image5d"].shape[0] == 8, "global batch not assembled"
    # exact checksum of the ASSEMBLED global batch: catches any row
    # misplacement/duplication in the process-local -> global mapping
    # bit-for-bit (the loss only compares loosely -- multi-process
    # executables fuse/reduce in a different order than single-process)
    import jax.numpy as jnp
    checksum = float(jnp.sum(jnp.abs(global_batch["image5d"])))
    state = replicate_state(create_train_state(model, global_batch, tx), mesh)
    from xpt_mde_tpu.parallel.multihost import lockstep
    step = lockstep(make_parallel_train_step(model, total_loss, mesh),
                    "mh_step_test")
    _, metrics = step(state, global_batch, jax.random.PRNGKey(0))
    print(f"MHLOSS {float(metrics['loss']):.6f} {checksum:.3f}", flush=True)


class _SlicedSynthetic:
    """SyntheticDataset view that yields this process's rows only (the
    per-process loader role of DatasetLoader(process_index=...))."""

    def __init__(self, ds, process_id: int, process_count: int):
        self.ds = ds
        self.pid = process_id
        self.pcount = process_count
        self.rows = ds.batch_size // process_count

    def config_keys(self):
        return self.ds.config_keys()

    def __len__(self):
        return len(self.ds)

    def __iter__(self):
        for batch in self.ds:
            yield {k: v[self.pid * self.rows:(self.pid + 1) * self.rows]
                   for k, v in batch.items()}


def plan_mode(process_id: int, num_processes: int, port: int,
              devs_per_proc: int, workdir: str):
    _couple(process_id, num_processes, port, devs_per_proc)

    from xpt_mde_tpu.config import SCALE_WEIGHT_T1, Config, TrainStage
    from xpt_mde_tpu.data import SyntheticDataset
    from xpt_mde_tpu.parallel.multihost import make_multihost_mesh
    from xpt_mde_tpu.training.trainer import train_by_plan

    nets = {"depth": "DepthNetBasic", "camera": "PoseNetImproved"}
    cfg = Config(stereo=False, per_replica_batch=1, compute_dtype="float32",
                 mesh_shape={"data": 8},
                 augment_probs={}, datapath=workdir, ckpt_name="mh",
                 training_plan=[TrainStage(nets, "synthetic", 1, 1e-4,
                                           {"L1": 1.0}, SCALE_WEIGHT_T1)])
    assert cfg.batch_size == 8, cfg.batch_size

    def factory(name, split, batch_size):
        if split == "val":
            raise FileNotFoundError("no val split in the multihost test")
        assert batch_size == 8 // num_processes  # per-process share
        return _SlicedSynthetic(
            SyntheticDataset(batch_size=8, height=32, width=64,
                             num_batches=2, seed=3),
            process_id, num_processes)

    mesh = make_multihost_mesh({"data": 8})
    train_by_plan(cfg, factory, mesh=mesh)

    import csv
    hist = Path(workdir) / "checkpts" / "mh" / "history.csv"
    if process_id == 0:
        with open(hist) as f:
            rows = list(csv.DictReader(f))
        print(f"MHPLAN {rows[-1]['train_loss']}", flush=True)
    else:
        print("MHPLAN done", flush=True)


if __name__ == "__main__":
    mode, pid, nproc, port, devs = (sys.argv[1], int(sys.argv[2]),
                                    int(sys.argv[3]), int(sys.argv[4]),
                                    int(sys.argv[5]))
    if mode == "step":
        step_mode(pid, nproc, port, devs)
    else:
        plan_mode(pid, nproc, port, devs, sys.argv[6])
