"""Golden tests for camera geometry and bilinear warp.

Ports the analytic assertions of
/root/reference/model/synthesize/test_synthesizing.py:149-301
(scale_intrinsic, pixel2cam, transform_to_source, pixel weighting,
bilinear reconstruction) onto the jnp ops, and adds equivalence checks
between the step-by-step chain and the fused reprojection.
"""

import jax.numpy as jnp
import numpy as np

from xpt_mde_tpu.ops import camera, warp
from xpt_mde_tpu.utils import se3


def test_scale_intrinsics():
    batch = 8
    k = np.tile(np.array([[8, 0, 4], [0, 8, 4], [0, 0, 1]], np.float32), (batch, 1, 1))
    k_sc = np.asarray(camera.scale_intrinsics(jnp.asarray(k), 2))
    assert np.allclose(k[:, :2] / 2, k_sc[:, :2])
    assert np.allclose(k[:, 2], k_sc[:, 2])


def test_invert_intrinsics():
    k = jnp.array([[[100.0, 2.0, 60.0], [0.0, 90.0, 40.0], [0.0, 0.0, 1.0]]])
    kinv = np.asarray(camera.invert_intrinsics(k))
    assert np.allclose(kinv[0] @ np.asarray(k[0]), np.eye(3), atol=1e-5)


def test_pixel_grid():
    grid = np.asarray(camera.pixel_grid(2, 3))
    assert grid.shape == (3, 6)
    # (u, v, 1) ordering, row-major over (v, u)
    assert np.allclose(grid[:, 0], [0, 0, 1])
    assert np.allclose(grid[:, 1], [1, 0, 1])
    assert np.allclose(grid[:, 3], [0, 1, 1])


def test_pixel2cam_shape_and_values():
    batch, height, width = 8, 4, 4
    grid = camera.pixel_grid(height, width)
    k = np.tile(np.array([[4, 0, 2], [0, 4, 2], [0, 0, 1]], np.float32), (batch, 1, 1))
    depth = jnp.ones((batch, height, width, 1)) * 2.0
    cam = np.asarray(camera.pixel2cam(grid, depth, jnp.asarray(k)))
    assert cam.shape == (batch, 4, height * width)
    # pixel (u=2, v=2) is the principal point -> ray (0, 0, 1) * depth
    idx = 2 * width + 2
    assert np.allclose(cam[0, :, idx], [0, 0, 2, 1], atol=1e-6)
    # homogeneous row of ones
    assert np.allclose(cam[:, 3], 1.0)


def test_transform_to_source():
    batch, num_pts, numsrc = 8, 6, 3
    coords = np.arange(1, 4 * num_pts + 1).reshape((num_pts, 4)).T.astype(np.float32)
    coords[3, :] = 1
    coords = np.tile(coords, (batch, 1, 1))
    poses = np.identity(4, np.float32) * 2
    poses[:3, 3] = 1
    poses[3, 3] = 1
    poses = np.tile(poses, (batch, numsrc, 1, 1))
    src = np.asarray(camera.transform_to_source(jnp.asarray(coords), jnp.asarray(poses)))
    assert np.allclose(coords[2, :3] * 2 + 1, src[2, 1, :3])


def test_cam2pixel_projects_back():
    """pixel -> cam -> (identity pose) -> pixel must round-trip."""
    batch, height, width = 2, 6, 8
    grid = camera.pixel_grid(height, width)
    k = jnp.tile(jnp.array([[[5.0, 0, 4.0], [0, 5.0, 3.0], [0, 0, 1]]]), (batch, 1, 1))
    depth = jnp.full((batch, height, width, 1), 3.0)
    cam = camera.pixel2cam(grid, depth, k)
    eye = jnp.tile(jnp.eye(4)[None, None], (batch, 1, 1, 1))
    src_cam = camera.transform_to_source(cam, eye)
    pix = np.asarray(camera.cam2pixel(src_cam, k))
    assert np.allclose(pix[0, 0, :2], np.asarray(grid)[:2], atol=1e-4)


def test_fused_reprojection_matches_chain():
    """reproject_pixel_coords == pixel2cam -> transform -> cam2pixel."""
    rng = np.random.RandomState(0)
    batch, numsrc, height, width = 2, 4, 8, 12
    k = np.tile(np.array([[20, 0, 6], [0, 20, 4], [0, 0, 1]], np.float32),
                (batch, 1, 1))
    depth = jnp.asarray(rng.uniform(2, 20, (batch, height, width, 1)).astype(np.float32))
    twists = jnp.asarray(rng.uniform(-0.2, 0.2, (batch, numsrc, 6)).astype(np.float32))
    poses = se3.twist_to_matrix(twists)

    grid = camera.pixel_grid(height, width)
    cam = camera.pixel2cam(grid, depth, jnp.asarray(k))
    src_cam = camera.transform_to_source(cam, poses)
    pix_chain = np.asarray(camera.cam2pixel(src_cam, jnp.asarray(k)))[:, :, :2]

    pix_fused = np.asarray(camera.reproject_pixel_coords(depth, poses, jnp.asarray(k)))
    assert np.allclose(pix_chain, pix_fused, atol=1e-3), (
        np.abs(pix_chain - pix_fused).max())


# ---------------------------------------------------------------------------
# bilinear warp


def test_bilinear_weights_and_oob_mask():
    """Port of test_pixel_weighting: fractional coords give the right 4
    weights; out-of-image samples give zero output."""
    batch, numsrc, height, width = 2, 3, 5, 5
    chk_u, chk_v = 0.2, 0.7
    rng = np.random.RandomState(1)
    coords = rng.uniform(0.1, 3.9, (batch, numsrc, 2, height * width)).astype(np.float32)
    coords[:, :, :, 0] = -1.5  # out of image (negative)
    coords[:, :, :, 1] = 7.0   # out of image (beyond far edge)
    coords[:, :, 0, 3] = 2 + chk_u
    coords[:, :, 1, 3] = 3 + chk_v

    # image value = flat pixel index so samples are checkable
    img_vals = np.arange(height * width, dtype=np.float32).reshape(height, width)
    image = np.tile(img_vals[None, None, :, :, None], (batch, numsrc, 1, 1, 1))

    out = np.asarray(warp.bilinear_sample(jnp.asarray(image), jnp.asarray(coords)))
    out_flat = out.reshape(batch, numsrc, -1)
    # OOB pixels -> black
    assert np.allclose(out_flat[:, :, 0], 0.0)
    assert np.allclose(out_flat[:, :, 1], 0.0)
    # checked pixel: bilinear of values at (v=3..4, u=2..3)
    expected = ((1 - chk_u) * (1 - chk_v) * img_vals[3, 2]
                + (1 - chk_u) * chk_v * img_vals[4, 2]
                + chk_u * (1 - chk_v) * img_vals[3, 3]
                + chk_u * chk_v * img_vals[4, 3])
    assert np.allclose(out_flat[:, :, 3], expected, atol=1e-4)


def test_bilinear_reconstruction_shift():
    """Port of test_reconstruct_bilinear_interp: shifting u by 1.3 shifts a
    column-index image by 1.3, with the last two columns invalid."""
    batch, numsrc, height, width = 2, 4, 5, 5
    u_add = 1.3
    u, v = np.meshgrid(np.arange(width, dtype=np.float32),
                       np.arange(height, dtype=np.float32))
    coords = np.stack([u + u_add, v], axis=0).reshape(1, 1, 2, -1)
    coords = np.tile(coords, (batch, numsrc, 1, 1))

    image = np.tile(u[None, None, :, :, None], (batch, numsrc, 1, 1, 3))
    depth = np.ones((batch, height, width, 1), np.float32)

    out = np.asarray(warp.bilinear_sample(
        jnp.asarray(image), jnp.asarray(coords), jnp.asarray(depth)))

    # reference expected mask (test_synthesizing.py:278-281): rows :4, cols :3
    # (integer coords exactly on the far border are invalid: ceil clips)
    expected_mask = np.zeros((height, width), np.float32)
    expected_mask[:4, :3] = 1
    expected = (u + u_add) * expected_mask
    assert np.allclose(out[0, 0, :, :, 0], expected, atol=1e-5)


def test_bilinear_zero_depth_masks_output():
    batch, numsrc, height, width = 1, 1, 4, 4
    u, v = np.meshgrid(np.arange(width, dtype=np.float32),
                       np.arange(height, dtype=np.float32))
    coords = np.tile(np.stack([u, v], 0).reshape(1, 1, 2, -1), (batch, numsrc, 1, 1))
    image = np.ones((batch, numsrc, height, width, 3), np.float32)
    depth = np.ones((batch, height, width, 1), np.float32)
    depth[0, 1, 1, 0] = 0.0  # invalid target pixel
    out = np.asarray(warp.bilinear_sample(
        jnp.asarray(image), jnp.asarray(coords), jnp.asarray(depth)))
    assert np.allclose(out[0, 0, 1, 1], 0.0)
    assert np.allclose(out[0, 0, 0, 0], 1.0)


def test_bilinear_sample_gradable():
    import jax

    def loss(image, coords):
        return jnp.sum(warp.bilinear_sample(image, coords) ** 2)

    rng = np.random.RandomState(2)
    image = jnp.asarray(rng.rand(1, 2, 6, 6, 3).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 5, (1, 2, 2, 36)).astype(np.float32))
    g_img, g_crd = jax.jit(jax.grad(loss, argnums=(0, 1)))(image, coords)
    assert np.isfinite(np.asarray(g_img)).all()
    assert np.isfinite(np.asarray(g_crd)).all()
    assert np.abs(np.asarray(g_crd)).sum() > 0


def test_bilinear_sample_paths_agree():
    """The one-hot (small-scale) and patch-gather (full-res) formulations
    must agree bit-closely on identical inputs."""
    from xpt_mde_tpu.ops.warp import (_neighbor_weights, _sample_onehot,
                                      _sample_patch_gather)
    rng = np.random.RandomState(7)
    image = jnp.asarray(rng.rand(2, 3, 16, 24, 3).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-2, 30, (2, 3, 2, 16 * 24))
                         .astype(np.float32))
    depth = jnp.asarray(rng.rand(2, 16, 24, 1).astype(np.float32))
    ints, weights = _neighbor_weights(image, coords, depth)
    a = np.asarray(_sample_onehot(image, ints, weights))
    b = np.asarray(_sample_patch_gather(image, ints, weights))
    assert np.allclose(a, b, atol=1e-5), np.abs(a - b).max()


def test_bilinear_sample_patch_path_gradable():
    """Full-res path (above the one-hot threshold) must be differentiable."""
    import jax

    from xpt_mde_tpu.ops import warp as warp_mod

    rng = np.random.RandomState(8)
    h, w = 66, 128  # 8448 px > ONEHOT_MAX_PIXELS
    assert h * w > warp_mod.ONEHOT_MAX_PIXELS
    image = jnp.asarray(rng.rand(1, 2, h, w, 3).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 60, (1, 2, 2, h * w))
                         .astype(np.float32))

    def loss(image, coords):
        return jnp.sum(warp_mod.bilinear_sample(image, coords) ** 2)

    g_img, g_crd = jax.jit(jax.grad(loss, argnums=(0, 1)))(image, coords)
    assert np.isfinite(np.asarray(g_img)).all()
    assert np.isfinite(np.asarray(g_crd)).all()
    assert np.abs(np.asarray(g_crd)).sum() > 0


def test_bf16_gather_option_close_to_f32():
    """Opt-in bf16 patch gather stays within quantization tolerance."""
    from xpt_mde_tpu.ops import warp as warp_mod

    rng = np.random.RandomState(9)
    h, w = 66, 128
    image = jnp.asarray(rng.rand(1, 2, h, w, 3).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 60, (1, 2, 2, h * w)).astype(np.float32))
    ref = np.asarray(warp_mod.bilinear_sample(image, coords))
    try:
        warp_mod.set_gather_dtype(jnp.bfloat16)
        out = np.asarray(warp_mod.bilinear_sample(image, coords))
    finally:
        warp_mod.set_gather_dtype(None)
    assert out.dtype == np.float32
    assert np.abs(out - ref).max() < 0.01
