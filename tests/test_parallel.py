"""Data-parallel tests on the virtual 8-device CPU mesh.

Validates the SPMD design the reference could never test (SURVEY.md §4):
sharded batches + replicated params, XLA-inserted gradient all-reduce,
and numerical equivalence with the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpt_mde_tpu import config as cfg
from xpt_mde_tpu.data import SyntheticDataset
from xpt_mde_tpu.losses import loss_factory
from xpt_mde_tpu.models import ModelFactory
from xpt_mde_tpu.parallel import (make_mesh, make_parallel_train_step,
                                  replicate_state, shard_batch)
from xpt_mde_tpu.training import create_train_state, optimizer_factory


@pytest.fixture(scope="module")
def dp_parts():
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    data = SyntheticDataset(batch_size=8, height=16, width=32, num_batches=2)
    factory = ModelFactory(data.config_keys(),
                           {"depth": "DepthNetBasic", "camera": "PoseNetBasic"},
                           stereo=False)
    model = factory.get_model()
    total_loss = loss_factory(data.config_keys(), {"L1": 1.0},
                              [4.0, 0.0, 0.0, 0.0], stereo=False,
                              batch_size=8)
    batch = {k: jnp.asarray(v) for k, v in next(iter(data)).items()}
    return data, model, total_loss, batch


def _fresh_state(model, batch):
    tx = optimizer_factory("adam_constant", 1e-4)
    return create_train_state(model, batch, tx)


def test_mesh_creation():
    mesh = make_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == 8


@pytest.mark.slow  # subsumed by test_parallel_matches_single_device (fast lane)
def test_parallel_step_runs(dp_parts):
    data, model, total_loss, batch = dp_parts
    mesh = make_mesh()
    state = replicate_state(_fresh_state(model, batch), mesh)
    sharded = shard_batch(batch, mesh)
    step = make_parallel_train_step(model, total_loss, mesh)
    state, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_parallel_matches_single_device(dp_parts):
    """One DP step over 8 devices == one single-device step on the same
    global batch (up to fp reduction order)."""
    data, model, total_loss, batch = dp_parts
    mesh = make_mesh()

    # single-device
    from xpt_mde_tpu.training import make_train_step
    state1 = _fresh_state(model, batch)
    params_before = jax.tree_util.tree_map(np.asarray, state1.params)
    step1 = make_train_step(model, total_loss)
    state1, m1 = step1(state1, batch, jax.random.PRNGKey(0))

    # data-parallel: same init (recreate -- donation consumed state1's init)
    state8 = _fresh_state(model, batch)
    # check inits match
    chex_same = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), b, atol=0),
        state8.params, params_before)
    assert all(jax.tree_util.tree_leaves(chex_same))
    state8 = replicate_state(state8, mesh)
    step8 = make_parallel_train_step(model, total_loss, mesh)
    state8, m8 = step8(state8, shard_batch(batch, mesh), jax.random.PRNGKey(0))

    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4), (
        float(m1["loss"]), float(m8["loss"]))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state1.params, state8.params)
    max_diff = max(jax.tree_util.tree_leaves(diffs))
    assert max_diff < 1e-4, max_diff


@pytest.mark.slow  # multihost-family compile; 2-proc pod test is slow-lane too
def test_lockstep_wrapper_matches_direct_call(dp_parts):
    """multihost.lockstep (AOT compile + barrier + execute) is
    semantically transparent: same results as calling the jitted step,
    donation still honored, compiled executable reused across calls."""
    from xpt_mde_tpu.parallel import lockstep

    data, model, total_loss, batch = dp_parts
    mesh = make_mesh()
    sharded = shard_batch(batch, mesh)

    state_a = replicate_state(_fresh_state(model, batch), mesh)
    step = make_parallel_train_step(model, total_loss, mesh)
    state_a, m_direct = step(state_a, sharded, jax.random.PRNGKey(0))

    state_b = replicate_state(_fresh_state(model, batch), mesh)
    locked = lockstep(make_parallel_train_step(model, total_loss, mesh),
                      "test")
    state_b, m_locked = locked(state_b, sharded, jax.random.PRNGKey(0))
    assert float(m_direct["loss"]) == float(m_locked["loss"])
    # second call: same signature -> cached executable, donation works
    state_b, m2 = locked(state_b, shard_batch(batch, mesh),
                         jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))


def test_data_spatial_mesh_matches_single_device(dp_parts):
    """2-D (data=4, spatial=2) mesh: batch shards over data AND image
    height shards over spatial (high-res scaling mode); results must
    match the single-device step."""
    data, model, total_loss, batch = dp_parts
    mesh = make_mesh({"data": 4, "spatial": 2})
    assert mesh.axis_names == ("data", "spatial")

    from xpt_mde_tpu.training import make_train_step
    state1 = _fresh_state(model, batch)
    step1 = make_train_step(model, total_loss)
    state1, m1 = step1(state1, batch, jax.random.PRNGKey(0))

    state8 = replicate_state(_fresh_state(model, batch), mesh)
    sharded = shard_batch(batch, mesh)
    # image tensors really are height-sharded
    img = sharded["image5d"]
    assert img.sharding.spec == ("data", None, "spatial")
    step8 = make_parallel_train_step(model, total_loss, mesh)
    state8, m8 = step8(state8, sharded, jax.random.PRNGKey(0))

    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4), (
        float(m1["loss"]), float(m8["loss"]))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state1.params, state8.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


def test_grads_synchronized_across_devices(dp_parts):
    """After a DP step, replicated params must be identical on all devices."""
    data, model, total_loss, batch = dp_parts
    mesh = make_mesh()
    state = replicate_state(_fresh_state(model, batch), mesh)
    step = make_parallel_train_step(model, total_loss, mesh)
    state, _ = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(3))
    # fully-replicated output sharding guarantees consistency; spot-check
    # by reading one leaf from two devices
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards[:2]]
    assert np.array_equal(shards[0], shards[1])



@pytest.mark.slow  # 295 s: the costliest fast-lane compile (8-dev
# spatial mesh + FMA dw routing); the routing itself is unit-covered,
# the mesh equivalence rides the slow lane (VERDICT r3 weak #2)
def test_spatial_mesh_with_fma_depthwise(monkeypatch):
    """The shape-routed FMA depthwise lowering (efficientnet.DepthwiseConv)
    is pad+slice+FMA -- on the height-sharded spatial mesh GSPMD must
    turn its halos into collective permutes and still match the
    single-device step (forced via XPT_DW_MODE=fma; the auto gate only
    fires at high-res shapes)."""
    monkeypatch.setenv("XPT_DW_MODE", "fma")
    data = SyntheticDataset(batch_size=4, height=32, width=64, num_batches=1)
    model = ModelFactory(data.config_keys(),
                         {"depth": "EfficientNetB0", "camera": "PoseNetBasic"},
                         stereo=False).get_model()
    total_loss = loss_factory(data.config_keys(), {"L1": 1.0},
                              [4.0, 0.0, 0.0, 0.0], stereo=False,
                              batch_size=4)
    batch = {k: jnp.asarray(v) for k, v in next(iter(data)).items()}

    from xpt_mde_tpu.training import make_train_step
    state1 = _fresh_state(model, batch)
    step1 = make_train_step(model, total_loss)
    state1, m1 = step1(state1, batch, jax.random.PRNGKey(0))

    mesh = make_mesh({"data": 4, "spatial": 2})
    state8 = replicate_state(_fresh_state(model, batch), mesh)
    sharded = shard_batch(batch, mesh)
    step8 = make_parallel_train_step(model, total_loss, mesh)
    state8, m8 = step8(state8, sharded, jax.random.PRNGKey(0))

    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4), (
        float(m1["loss"]), float(m8["loss"]))


def test_spatial_mesh_does_not_shard_pose_axes():
    """Spatial sharding keys off the feature NAME, not rank: pose_gt
    [B, numsrc, 4, 4] must stay data-sharded (its axis 1 is numsrc, not
    height) -- a rank-based rule crashed when numsrc % spatial != 0."""
    mesh = make_mesh({"data": 1, "spatial": 8})
    batch = {
        "image5d": jnp.zeros((8, 5, 16, 32, 3)),
        "depth_gt": jnp.zeros((8, 16, 32, 1)),
        "pose_gt": jnp.zeros((8, 4, 4, 4)),     # numsrc=4 not divisible by 8
        "stereo_T_LR": jnp.zeros((8, 4, 4)),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["image5d"].sharding.spec == ("data", None, "spatial")
    assert sharded["depth_gt"].sharding.spec == ("data", "spatial")
    assert sharded["pose_gt"].sharding.spec == ("data",)
    assert sharded["stereo_T_LR"].sharding.spec == ("data",)


@pytest.mark.slow  # accum==full-batch equality is covered single-device
# in test_train_step; the mesh variant rides the slow lane
def test_parallel_grad_accum_runs(dp_parts):
    """grad_accum_steps composes with the mesh path: the microbatch
    reshape resharding compiles and the loss matches the no-accum step
    (BN-free model, SGD-free comparison on the loss metric only)."""
    data, model, total_loss, batch = dp_parts
    mesh = make_mesh()
    sharded = shard_batch(batch, mesh)

    state_a = replicate_state(_fresh_state(model, batch), mesh)
    step_a = make_parallel_train_step(model, total_loss, mesh)
    state_a, m_a = step_a(state_a, sharded, jax.random.PRNGKey(0))

    state_b = replicate_state(_fresh_state(model, batch), mesh)
    step_b = make_parallel_train_step(model, total_loss, mesh,
                                      grad_accum_steps=2)
    state_b, m_b = step_b(state_b, shard_batch(batch, mesh),
                          jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-5)


# --------------------------------------------------------------------------
# flow/joint stages on the mesh (VERDICT r2 weak #1): the PWC-Net
# correlation op under batch sharding (DP) and height sharding (2-D mesh)

JOINT_NETS = {"depth": "DepthNetBasic", "camera": "PoseNetBasic",
              "flow": "PWCNet"}


@pytest.fixture(scope="module")
def joint_parts():
    # 64x128 is PWC-Net's minimum (6 stride-2 levels)
    data = SyntheticDataset(batch_size=8, height=64, width=128,
                            num_batches=1)
    model = ModelFactory(data.config_keys(), JOINT_NETS,
                         stereo=False).get_model()
    total_loss = loss_factory(data.config_keys(),
                              {"cmbL1": 5.0, "cmbSSIM": 0.5, "smoothe": 1.0},
                              cfg.SCALE_WEIGHT_T1, stereo=False,
                              batch_size=8)
    batch = {k: jnp.asarray(v) for k, v in next(iter(data)).items()}
    return data, model, total_loss, batch


@pytest.mark.slow
def test_joint_parallel_matches_single_device(joint_parts):
    """The TRAINING_PLAN_28 fine-tune workload (PWC-Net + frozen flownet
    + cmb recipe) DP-sharded over 8 devices == single device."""
    data, model, total_loss, batch = joint_parts
    mesh = make_mesh()

    from xpt_mde_tpu.training import make_train_step
    tx = optimizer_factory("adam_constant", 1e-4, frozen_nets=["flownet"])
    state1 = create_train_state(model, batch, tx)
    step1 = make_train_step(model, total_loss, frozen_nets=["flownet"])
    state1, m1 = step1(state1, batch, jax.random.PRNGKey(0))

    state8 = replicate_state(create_train_state(model, batch, tx), mesh)
    step8 = make_parallel_train_step(model, total_loss, mesh,
                                     frozen_nets=["flownet"])
    state8, m8 = step8(state8, shard_batch(batch, mesh),
                       jax.random.PRNGKey(0))

    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4), (
        float(m1["loss"]), float(m8["loss"]))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state1.params, state8.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4
    # frozen flownet stayed bit-identical on the mesh too
    same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state1.params["flownet"], state8.params["flownet"])
    assert all(jax.tree_util.tree_leaves(same))


@pytest.mark.slow
def test_flow_parallel_on_2d_mesh_matches_single_device(joint_parts):
    """Flow pre-training (PWC-Net alone, flowL2 + regularizer) on the
    2-D data x spatial mesh: the correlation op's displacement-window
    shifts become halo exchanges under height sharding and must still
    match the single-device step."""
    data, _, _, batch = joint_parts
    model = ModelFactory(data.config_keys(), {"flow": "PWCNet"},
                         stereo=False).get_model()
    total_loss = loss_factory(data.config_keys(),
                              {"flowL2": 1.0, "flow_reg": 4e-7},
                              cfg.SCALE_WEIGHT_T1, stereo=False,
                              batch_size=8)

    from xpt_mde_tpu.training import make_train_step
    tx = optimizer_factory("adam_constant", 1e-4)
    state1 = create_train_state(model, batch, tx)
    step1 = make_train_step(model, total_loss, regularize_net="flownet")
    state1, m1 = step1(state1, batch, jax.random.PRNGKey(0))

    mesh = make_mesh({"data": 4, "spatial": 2})
    state8 = replicate_state(create_train_state(model, batch, tx), mesh)
    sharded = shard_batch(batch, mesh)
    assert sharded["image5d"].sharding.spec == ("data", None, "spatial")
    step8 = make_parallel_train_step(model, total_loss, mesh,
                                     regularize_net="flownet")
    state8, m8 = step8(state8, sharded, jax.random.PRNGKey(0))

    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4), (
        float(m1["loss"]), float(m8["loss"]))
    for key in m1:
        assert np.isclose(float(m1[key]), float(m8[key]),
                          rtol=1e-3, atol=1e-6), (key, float(m1[key]),
                                                  float(m8[key]))
    # one Adam step moves each param by ~±lr (bias-corrected first
    # step); height-sharded reduction order can flip the SIGN of a
    # near-zero flow gradient, so pointwise params can differ by up to
    # 2*lr between bit-different-but-correct runs -- bound by that, not
    # by grad agreement (the loss terms above pin the forward)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state1.params, state8.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 2.5e-4


def test_pallas_correlation_batch_sharded_not_replicated():
    """The custom_partitioning wrapper (ops/pallas/spmd.py) must keep the
    Pallas correlation's output batch-sharded under a DP jit -- without
    it GSPMD replicates the custom call (all devices compute the full
    batch). Interpreter-mode kernel on the CPU mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from xpt_mde_tpu.ops.correlation import correlation_cost
    from xpt_mde_tpu.ops.pallas.correlation import _corr_pallas

    mesh = make_mesh()
    rng = np.random.RandomState(0)
    cl = jnp.asarray(rng.rand(8, 16, 32, 8).astype(np.float32))
    cr = jnp.asarray(rng.rand(8, 16, 32, 8).astype(np.float32))
    sh = NamedSharding(mesh, P("data"))
    offsets = tuple(range(-2, 3))

    out = jax.jit(lambda a, b: _corr_pallas(a, b, offsets, True))(
        jax.device_put(cl, sh), jax.device_put(cr, sh))
    assert out.sharding.spec == ("data",), out.sharding
    ref = correlation_cost(cl, cr, 2, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # gradients partition too (the bwd kernels carry their own wrappers)
    def loss(a, b):
        return jnp.sum(_corr_pallas(a, b, offsets, True) ** 2)
    g = jax.jit(jax.grad(loss))(jax.device_put(cl, sh),
                                jax.device_put(cr, sh))
    g_ref = jax.grad(lambda a, b: jnp.sum(
        correlation_cost(a, b, 2, 1) ** 2))(cl, cr)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_batch_partitioned_rejects_indivisible_leading_dims():
    """ADVICE r3: a mesh whose data-axis size divides one operand's
    leading dim but not another's (the b4-mask-on-8-chips case) must
    fail with the named DP-contract error, not an opaque XLA sharding
    failure deep inside partitioning."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from xpt_mde_tpu.ops.pallas.spmd import batch_partitioned

    mesh = make_mesh()

    def kernel(a, b):  # images [B*2, C] + mask [B, C], like the warp
        return a + jnp.repeat(b, a.shape[0] // b.shape[0], axis=0)

    f = batch_partitioned(kernel)
    a = jnp.ones((8, 4), jnp.float32)
    b = jnp.ones((4, 4), jnp.float32)  # lead 4: indivisible by 8 shards
    sh = NamedSharding(mesh, P("data"))
    with pytest.raises(Exception, match="DP contract"):
        np.asarray(jax.jit(f)(jax.device_put(a, sh), b))


def test_pallas_warp_batch_sharded_not_replicated():
    """Same for the warp kernel: batch-sharded output under DP jit,
    values matching the XLA sampler."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from xpt_mde_tpu.ops.pallas.warp import bilinear_sample_const_src
    from xpt_mde_tpu.ops.warp import bilinear_sample

    mesh = make_mesh()
    rng = np.random.RandomState(1)
    b, n, h, w, c = 8, 2, 16, 128, 3
    image = jnp.asarray(rng.rand(b, n, h, w, c).astype(np.float32))
    u = rng.uniform(0, w - 1, (b, n, 1, h * w)).astype(np.float32)
    v = rng.uniform(0, h - 1, (b, n, 1, h * w)).astype(np.float32)
    coords = jnp.asarray(np.concatenate([u, v], axis=2))
    sh = NamedSharding(mesh, P("data"))

    out = jax.jit(lambda im, co: bilinear_sample_const_src(
        im, co, None, mode="exact", interpret=True))(
        jax.device_put(image, sh), jax.device_put(coords, sh))
    assert out.sharding.spec == ("data",), out.sharding
    ref = bilinear_sample(image, coords, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
