"""Batch-dim SPMD partitioning for Pallas kernels.

XLA's SPMD partitioner treats a Mosaic custom call as opaque: under a
sharded jit it all-gathers the operands and runs the FULL batch on every
device (verified on the 8-device CPU mesh -- the output comes back
replicated). Both production kernels here (ops/pallas/warp.py,
ops/pallas/correlation.py) are embarrassingly parallel over the leading
batch axis, so ``batch_partitioned`` wraps them in
``jax.experimental.custom_partitioning`` declaring exactly that: every
operand and result shards on its leading axis over whatever mesh axes
the first operand's batch carries; the per-shard computation is the
unmodified kernel on the local slice.

This is what lets the flow/joint training stages keep their Pallas
kernels under a data-parallel mesh instead of falling back to the XLA
formulations (the spatial-mesh case still routes to XLA ops -- a
height-sharded frame genuinely needs halo exchange, which these kernels
do not implement).

Requirements: every argument/result has a leading batch-like axis, and
all leading axes are equal multiples of the mesh's data-axis size (the
standard DP divisibility contract). Leading axes may DIFFER in size
(e.g. the warp kernel takes [B*numsrc, ...] images and a [B, ...] mask)
-- each is sharded on the same mesh axes, and block index maps of the
form ``b // numsrc`` stay correct because shards hold whole contiguous
groups.
"""

from __future__ import annotations

import functools

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _leading_axis_partition(shardings):
    """The mesh-axis spec of the first sharded operand's leading dim."""
    for sh in shardings:
        if isinstance(sh, NamedSharding) and len(sh.spec) and sh.spec[0]:
            return sh.mesh, sh.spec[0]
    first = shardings[0]
    return getattr(first, "mesh", None), None


def _shard_leading(mesh, spec0, tree):
    import jax
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P(spec0)), tree)


def _n_shards(mesh, spec0) -> int:
    if spec0 is None:
        return 1
    names = spec0 if isinstance(spec0, tuple) else (spec0,)
    size = 1
    for name in names:
        size *= mesh.shape[name]
    return size


def _check_dp_contract(mesh, spec0, arg_infos):
    """Fail early, by name, when the DP divisibility contract is broken
    (ADVICE r3): every operand's leading dim must be divisible by the
    sharded mesh-axis product, and by the smallest leading dim (so
    shards hold whole contiguous ``b // numsrc`` groups). Without this
    XLA fails deep inside partitioning with an opaque sharding error --
    or worse, would split shards across numsrc groups."""
    n = _n_shards(mesh, spec0)
    if n == 1:
        return
    leads = [a.shape[0] for a in arg_infos if a.shape]
    min_lead = min(leads)
    for a in arg_infos:
        lead = a.shape[0] if a.shape else 1
        if lead % n:
            raise ValueError(
                f"batch_partitioned DP contract: leading dim {lead} of "
                f"operand shape {a.shape} is not divisible by mesh axes "
                f"{spec0!r} (size {n}); every kernel operand's batch axis "
                "must split evenly over the data mesh (ops/pallas/spmd.py)")
        if lead % min_lead:
            raise ValueError(
                f"batch_partitioned DP contract: leading dim {lead} of "
                f"operand shape {a.shape} is not a whole multiple of the "
                f"smallest operand batch {min_lead}; shards would straddle "
                "per-example groups (ops/pallas/spmd.py)")


def _make_wrapped(fn, shapes_key):
    """Build the custom_partitioning instance for one rank/size signature.

    The Shardy rule DSL needs concrete ranks, so the instance is created
    at first call and cached per signature. Rule: operands/results whose
    leading dim equals the first operand's share the batch factor ``b``
    (so Shardy propagates batch sharding through the op); every other
    dim is a unique free factor.
    """
    arg_shapes, out_shapes = shapes_key
    wrapped = custom_partitioning(fn)

    def partition(mesh, arg_infos, result_infos):
        _, spec0 = _leading_axis_partition(
            tuple(a.sharding for a in arg_infos))
        _check_dp_contract(mesh, spec0, arg_infos)
        arg_sh = tuple(NamedSharding(mesh, P(spec0)) for _ in arg_infos)
        out_sh = _shard_leading(mesh, spec0, result_infos)

        def lower_fn(*args):
            return fn(*args)

        return mesh, lower_fn, out_sh, arg_sh

    def infer_sharding(mesh, arg_infos, result_infos):
        _, spec0 = _leading_axis_partition(
            tuple(a.sharding for a in arg_infos))
        return _shard_leading(mesh, spec0, result_infos)

    lead = arg_shapes[0][0]
    fresh = iter(f"f{i}" for i in range(sum(map(len, arg_shapes))
                                        + sum(map(len, out_shapes))))

    def dims(shape, is_result):
        names = []
        for axis, size in enumerate(shape):
            if axis == 0 and size == lead and (not is_result or _b_in_args):
                names.append("b")
            else:
                names.append(next(fresh))
        return " ".join(names) if names else "1"

    _b_in_args = any(s and s[0] == lead for s in arg_shapes)
    rule_in = ", ".join(dims(s, False) for s in arg_shapes)
    rule_out = ", ".join(dims(s, True) for s in out_shapes)
    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=f"{rule_in} -> {rule_out}")
    return wrapped


def batch_partitioned(fn):
    """Wrap ``fn(*arrays) -> array | tuple`` so SPMD shards it over the
    leading batch axis instead of replicating the custom call.

    ``fn`` must be shape-polymorphic over the leading axis of every
    argument (it may read shapes from its operands). Returns a callable
    with the same signature; outside a multi-device jit the wrapper is
    transparent. Instances are cached per concrete shape signature.
    """
    import jax

    cache: dict = {}

    @functools.wraps(fn)
    def call(*args):
        key = (tuple(tuple(a.shape) for a in args),)
        inst = cache.get(key)
        if inst is None:
            out_shape = jax.eval_shape(fn, *args)
            out_shapes = tuple(
                tuple(o.shape)
                for o in jax.tree_util.tree_leaves(out_shape))
            inst = _make_wrapped(fn, (key[0], out_shapes))
            cache[key] = inst
        return inst(*args)

    return call
