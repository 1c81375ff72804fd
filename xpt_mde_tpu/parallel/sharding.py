"""Data-parallel train step via SPMD sharding annotations.

TPU-first replacement for the reference's MirroredStrategy plumbing
(/root/reference/model/model_util/distributer.py): there is no replica
loop, no per-replica output integrator, no strategy scope. The SAME
train-step function jits with

- params/opt-state replicated over the mesh,
- the batch sharded along the ``data`` axis,

and XLA's SPMD partitioner inserts the gradient all-reduce (psum) over
ICI automatically. ``TotalLoss`` divides by the *global* batch size
(losses.py:49 semantics), so per-device partial sums compose exactly.

Defects of the reference explicitly NOT carried over (SURVEY.md §2.7):
the distributed dataset tuple-unpack crash and the 2-replica-only
integrate_scalar_loss dead code -- neither concept exists here.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def _replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _has_spatial(mesh: Mesh) -> bool:
    return "spatial" in mesh.axis_names and mesh.shape["spatial"] > 1


# feature-name prefixes whose arrays carry spatial (H, W) axes; poses,
# intrinsics and extrinsics stay data-sharded only even though pose_gt
# is 4-D ([B, numsrc, 4, 4] -- its axis 1 is NOT height)
_SPATIAL_KEYS = ("image", "depth_gt", "flow_gt")


def feature_sharding(mesh: Mesh, ndim: int, name: str = "") -> NamedSharding:
    """Sharding spec for one feature array.

    1-D mesh: everything shards on the leading batch axis. 2-D
    ``("data", "spatial")`` mesh (high-res scaling): image-like tensors
    (by feature NAME -- image*/depth_gt*/flow_gt*) also shard their
    height axis -- [B, S, H, W, C] -> P(data, None, spatial),
    [B, H, W, C] -> P(data, spatial); per-example tensors (intrinsics,
    poses) stay data-sharded only regardless of rank. XLA's SPMD
    partitioner turns the conv halos into ICI collective-permutes."""
    spatial = name.startswith(_SPATIAL_KEYS)
    if _has_spatial(mesh) and spatial and ndim >= 4:
        spec = (("data", None, "spatial") if ndim >= 5
                else ("data", "spatial"))
        return NamedSharding(mesh, P(*spec))
    return _data_sharding(mesh)


def shard_batch(features: Mapping[str, Any], mesh: Mesh) -> dict:
    """Device-put every feature array with its mesh sharding (batch axis,
    plus the image height axis on a 2-D data x spatial mesh).

    Multi-host: each process passes only its PROCESS-LOCAL rows (the
    loader's disjoint slice of the global batch) and gets back the
    global array (jax.make_array_from_process_local_data)."""
    import numpy as np
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
                    feature_sharding(mesh, np.ndim(v), k), np.asarray(v))
                for k, v in features.items()}
    return {k: jax.device_put(v, feature_sharding(mesh, np.ndim(v), k))
            for k, v in features.items()}


def replicate_state(state, mesh: Mesh):
    """Device-put the train state fully replicated across the mesh."""
    return jax.device_put(state, _replicated(mesh))


def make_parallel_train_step(model, total_loss, mesh: Mesh,
                             augmenter=None,
                             regularize_net: Optional[str] = None,
                             frozen_nets=(),
                             grad_accum_steps: int = 1) -> Callable:
    """Jit the train step over the mesh: batch sharded on ``data``,
    state replicated; XLA inserts psum for the grads over ICI.

    ``total_loss.batch_size`` must be the GLOBAL batch size (or None, in
    which case the global batch dim of the sharded array is used, which
    is already global under SPMD).
    """
    from xpt_mde_tpu.training.train_step import make_train_step

    # the SAME step function as the single-device path (no duplicated
    # body to drift); only the jit shardings differ
    step_body = make_train_step(model, total_loss, augmenter=augmenter,
                                regularize_net=regularize_net, jit=False,
                                frozen_nets=frozen_nets,
                                grad_accum_steps=grad_accum_steps)
    repl = _replicated(mesh)
    # features keep the shardings shard_batch committed them with (data
    # axis always; + height over "spatial" on a 2-D mesh)
    return jax.jit(
        step_body,
        in_shardings=(repl, None, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
