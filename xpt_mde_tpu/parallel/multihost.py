"""Multi-host scaling: DCN-aware mesh + per-process batch assembly.

The reference tops out at one machine -- MirroredStrategy over the local
GPUs (/root/reference/model/model_util/distributer.py:9-44, SURVEY.md
§2.7). The TPU-native design scales past a single host with the standard
JAX multi-controller recipe:

- every host (process) runs the SAME program and owns its local chips;
  ``initialize()`` couples them through jax.distributed;
- ``make_multihost_mesh`` lays the global device mesh out host-major, so
  the ``data`` axis's gradient all-reduce lowers hierarchically: XLA
  reduce-scatters over ICI within each host and crosses DCN only once
  per host, not once per chip;
- each host feeds ONLY its shard of the global batch
  (``DatasetLoader(process_index=..., process_count=...)`` reads a
  disjoint slice of the shared shuffle order) and
  ``sharding.shard_batch`` assembles the global array from the
  process-local rows (``jax.make_array_from_process_local_data``);
- exactly one process (``is_main_process``) writes checkpoints, logs and
  sample panels; metrics are replicated scalars so every host already
  agrees on their values.

Works identically on a CPU "pod" (N processes x M virtual devices, Gloo
collectives) which is how tests/test_multihost.py exercises it without
TPU pod hardware.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids: Sequence[int] | None = None,
               **timeouts) -> None:
    """Couple this process into a multi-host run (no-op if already
    coupled). On TPU pods all arguments come from the environment; on
    CPU/GPU clusters pass them explicitly. Call ONCE, before any other
    JAX API touches the backend.

    ``timeouts`` passes through jax.distributed.initialize's
    ``heartbeat_timeout_seconds`` / ``shutdown_timeout_seconds`` /
    ``initialization_timeout``: raise them when processes share
    oversubscribed host cores (compiles starve the heartbeat thread --
    the CPU-pod tests run 2 workers on one core)."""
    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:
        return  # already coupled (don't probe via jax.process_count():
        # that would initialize the backend single-process first)
    kwargs = dict(timeouts)
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def is_main_process() -> bool:
    """True on the one process that owns filesystem side effects
    (checkpoints, history.csv, sample panels, config snapshots)."""
    return jax.process_index() == 0


def _host_major_devices() -> list:
    """Global devices ordered host-major: all of process 0's chips, then
    process 1's, ... Within a process, by device id (the local ICI
    order). This makes any mesh whose trailing axes fit within one
    host's chip count keep those axes ICI-local."""
    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def make_multihost_mesh(shape: Mapping[str, int] | None = None) -> Mesh:
    """Global mesh over every chip of every host.

    ``shape`` follows parallel.mesh.make_mesh semantics (ordered
    {axis: size}, product == global device count; default 1-D
    ``{"data": N}``). The LEADING axis spans hosts (DCN between them);
    trailing axes must divide the per-host chip count so they stay on
    ICI -- e.g. 4 hosts x 8 chips: ``{"data": 32}`` pure DP, or
    ``{"data": 16, "spatial": 2}`` with the height halves always
    co-hosted. On TPU pods with slice metadata,
    ``mesh_utils.create_hybrid_device_mesh`` refines the within-host
    ordering; otherwise host-major ordering is used directly."""
    devices = _host_major_devices()
    if shape is None:
        shape = {"data": len(devices)}
    axis_names = tuple(shape.keys())
    dims = tuple(shape.values())
    if int(np.prod(dims)) != len(devices):
        raise ValueError(f"mesh shape {shape} needs {int(np.prod(dims))} "
                         f"devices, have {len(devices)}")
    local = jax.local_device_count()
    trailing = int(np.prod(dims[1:], dtype=np.int64))
    if trailing > 1 and local % trailing != 0:
        raise ValueError(
            f"trailing axes {dict(list(shape.items())[1:])} (size "
            f"{trailing}) must divide the per-host device count {local} "
            f"so they ride ICI, not DCN")
    if jax.process_count() > 1:
        try:  # TPU pods: slice-aware layout (needs slice_index metadata)
            from jax.experimental import mesh_utils
            nproc = jax.process_count()
            per = (dims[0] // nproc,) + dims[1:]
            dcn = (nproc,) + (1,) * (len(dims) - 1)
            dev_mesh = mesh_utils.create_hybrid_device_mesh(
                per, dcn, devices=devices)
            return Mesh(dev_mesh, axis_names)
        except (ValueError, AttributeError):
            pass  # no slice metadata (CPU pods) -> host-major below
    return Mesh(np.array(devices).reshape(dims), axis_names)


def lockstep(jitted, tag: str):
    """Make a jitted collective program multi-host-robust: on the first
    call per input signature, AOT-compile (``lower().compile()``), then
    barrier across processes, THEN execute.

    Why: the runtime gives collective-context rendezvous a short
    deadline (XLA's Gloo key-value exchange allows peers ~30s to show
    up), while per-process COMPILE skew is unbounded — a host with a
    warm persistent-cache entry reaches the first execution minutes
    before one that compiles cold, and the fast host's step then dies
    with "Gloo context initialization failed: DEADLINE_EXCEEDED". The
    barrier separates compile (skewed, collective-free) from execution
    (lockstep). Subsequent calls dispatch straight to the compiled
    executable.

    Every process must call the wrapped program with the same sequence
    of input signatures (true for the trainer: static shapes,
    drop-remainder batching)."""
    from jax.experimental import multihost_utils

    compiled: dict = {}

    def _sig(x):
        if hasattr(x, "shape"):
            sh = getattr(x, "sharding", None)
            return (x.shape, str(x.dtype), str(sh))
        return x

    def wrapped(*args):
        key = (jax.tree_util.tree_structure(args),
               tuple(_sig(l) for l in jax.tree_util.tree_leaves(args)))
        if key not in compiled:
            compiled[key] = jitted.lower(*args).compile()
            multihost_utils.sync_global_devices(
                f"xpt:lockstep:{tag}:{len(compiled)}")
        return compiled[key](*args)

    return wrapped


def local_view(x) -> np.ndarray:
    """Materialize the rows of a batch-sharded global array that live on
    THIS process (concatenated in shard order). Use for host-side
    consumers (logger panels, npz prediction dumps) that cannot fetch a
    non-addressable global array."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    shards = sorted(x.addressable_shards, key=lambda s: s.index)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
