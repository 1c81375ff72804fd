"""End-to-end view-synthesis tests on analytic scenes.

The key property test (mirroring the spirit of
/root/reference/model/loss_and_metric/test_loss.py:79-121): with ground
truth depth and pose, synthesizing the target from a rendered source must
reproduce the target almost exactly inside the valid region, and identity
pose + any depth must reproduce the source exactly.
"""

import jax.numpy as jnp
import numpy as np

from xpt_mde_tpu.ops import synthesize_multi_scale, flow_warp_multi_scale
from xpt_mde_tpu.utils import se3


def make_textured_plane_scene(batch=1, numsrc=2, height=32, width=48, depth_z=10.0):
    """A fronto-parallel textured plane at depth z, camera translated in x.

    With pure x-translation tx, points at depth z shift by u' = u + fx*tx/z,
    so the warp is an exact horizontal shift -- analytically checkable.
    """
    rng = np.random.RandomState(0)
    fx = fy = 30.0
    k = np.array([[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]], np.float32)
    k = np.tile(k, (batch, 1, 1))

    # smooth random texture (piecewise-linear rows so bilinear sampling is exact)
    u = np.arange(width, dtype=np.float32)
    texture = np.sin(u / 3.0)[None, :] + np.linspace(0, 1, height)[:, None]
    target = np.tile(texture[None, :, :, None], (batch, 1, 1, 3)).astype(np.float32)

    tx = 1.0  # meters; shift = fx*tx/z = 3 pixels exactly
    shift = fx * tx / depth_z
    assert float(shift).is_integer()
    shift = int(shift)

    # We build sources such that sampling source at (u + shift) returns
    # target(u): source[u] = target[u - shift]
    sources = np.zeros((batch, numsrc, height, width, 3), np.float32)
    for n in range(numsrc):
        sources[:, n, :, shift:] = target[:, :, :-shift]
        sources[:, n, :, :shift] = target[:, :, :1]  # edge pad

    # target->source twist with tx=+1: u_src = u + fx*tx/z = u + shift,
    # so synth(u) = source(u + shift) = target(u)
    twist = np.zeros((batch, numsrc, 6), np.float32)
    twist[:, :, 0] = tx
    depth = np.full((batch, height, width, 1), depth_z, np.float32)
    return (jnp.asarray(sources), jnp.asarray(k), jnp.asarray(depth),
            jnp.asarray(twist), jnp.asarray(target), shift)


def test_synthesis_with_gt_reproduces_target():
    sources, k, depth, twist, target, shift = make_textured_plane_scene()
    synth_ms = synthesize_multi_scale(sources, k, [depth], twist)
    assert len(synth_ms) == 1
    synth = np.asarray(synth_ms[0])
    # valid region: columns whose reprojected sample stays inside the source.
    # 1-px margin on every side: exact-border coordinates are invalid by the
    # ceil-clip rule, and fp epsilon in the reprojection can push u=0 / v=0
    # infinitesimally negative (same border discontinuity as the reference).
    err = np.abs(synth[0, 0, 1:-1, 1: -(shift + 1)]
                 - np.asarray(target)[0, 1:-1, 1: -(shift + 1)])
    assert err.max() < 1e-3, err.max()


def test_identity_pose_reproduces_source():
    rng = np.random.RandomState(1)
    batch, numsrc, height, width = 2, 2, 16, 24
    sources = jnp.asarray(rng.rand(batch, numsrc, height, width, 3).astype(np.float32))
    k = jnp.tile(jnp.array([[[20.0, 0, 12.0], [0, 20.0, 8.0], [0, 0, 1]]]),
                 (batch, 1, 1))
    depth = jnp.asarray(rng.uniform(5, 30, (batch, height, width, 1)).astype(np.float32))
    twist = jnp.zeros((batch, numsrc, 6))
    synth = np.asarray(synthesize_multi_scale(sources, k, [depth], twist)[0])
    # identity transform: target view == source image on interior pixels
    # (border pixels are invalid by the ceil-clip rule + fp epsilon)
    assert np.allclose(synth[:, :, 1: height - 1, 1: width - 1],
                       np.asarray(sources)[:, :, 1: height - 1, 1: width - 1],
                       atol=1e-4)


def test_multi_scale_shapes():
    sources, k, depth, twist, target, _ = make_textured_plane_scene(height=32, width=48)
    depth_ms = [depth,
                jnp.asarray(np.full((1, 16, 24, 1), 10.0, np.float32)),
                jnp.asarray(np.full((1, 8, 12, 1), 10.0, np.float32))]
    synth_ms = synthesize_multi_scale(sources, k, depth_ms, twist)
    assert [s.shape for s in synth_ms] == [
        (1, 2, 32, 48, 3), (1, 2, 16, 24, 3), (1, 2, 8, 12, 3)]


def test_gt_pose_beats_noisy_pose():
    """Property test from the reference (test_loss.py:79-121): photometric
    error with GT pose must be lower than with noise-corrupted pose."""
    sources, k, depth, twist, target, shift = make_textured_plane_scene()
    synth_gt = np.asarray(synthesize_multi_scale(sources, k, [depth], twist)[0])
    noisy = twist + jnp.asarray(
        np.random.RandomState(3).uniform(-0.3, 0.3, twist.shape).astype(np.float32))
    synth_noisy = np.asarray(synthesize_multi_scale(sources, k, [depth], noisy)[0])
    tgt = np.asarray(target)[:, None]

    def masked_l1(synth):
        gray = synth.mean(axis=-1, keepdims=True)
        mask = (gray != 0).astype(np.float32)
        return (np.abs(synth - tgt) * mask).sum() / np.maximum(mask.sum(), 1)

    assert masked_l1(synth_gt) < masked_l1(synth_noisy)


def test_flow_warp_identity():
    rng = np.random.RandomState(4)
    batch, numsrc, height, width = 1, 2, 12, 16
    sources = jnp.asarray(rng.rand(batch, numsrc, height, width, 3).astype(np.float32))
    flow = jnp.zeros((batch, numsrc, height, width, 2))
    warped = np.asarray(flow_warp_multi_scale(sources, [flow])[0])
    assert np.allclose(warped[:, :, : height - 1, : width - 1],
                       np.asarray(sources)[:, :, : height - 1, : width - 1], atol=1e-5)


def test_flow_warp_shift():
    """flow = (+2, 0) with convention (grid - flow) samples source at u-2,
    i.e. warped[u] = source[u-2]."""
    batch, numsrc, height, width = 1, 1, 8, 12
    u = np.meshgrid(np.arange(width, dtype=np.float32),
                    np.arange(height, dtype=np.float32))[0]
    source = jnp.asarray(np.tile(u[None, None, :, :, None], (1, 1, 1, 1, 3)))
    flow = np.zeros((batch, numsrc, height, width, 2), np.float32)
    flow[..., 0] = 2.0
    warped = np.asarray(flow_warp_multi_scale(source, [jnp.asarray(flow)])[0])
    # interior: warped value = u - 2
    assert np.allclose(warped[0, 0, : height - 1, 2: width - 1, 0],
                       u[: height - 1, 2: width - 1] - 2.0, atol=1e-5)
