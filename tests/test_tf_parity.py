"""Numeric parity vs TensorFlow semantics (SURVEY.md hard part #6).

The reference's losses depend on subtle TF op behaviors: SAME-padding
average pooling that EXCLUDES padded cells, and half-pixel-center
bilinear resize. TF (CPU) is available in this environment, so these
tests pin our jnp implementations directly against the originals.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from xpt_mde_tpu.losses.photometric import (avg_pool_3x3_same,  # noqa: E402
                                            photometric_loss_ssim)
from xpt_mde_tpu.utils.image import resize_image  # noqa: E402


def test_avg_pool_matches_tf_avg_pool3d():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 12, 16, 3).astype(np.float32)
    ours = np.asarray(avg_pool_3x3_same(jnp.asarray(x)))
    theirs = tf.keras.layers.AveragePooling3D(
        pool_size=[1, 3, 3], strides=1, padding="SAME")(x).numpy()
    assert np.allclose(ours, theirs, atol=1e-6), np.abs(ours - theirs).max()


def test_ssim_loss_matches_tf_formulation():
    """Full SSIM loss vs a TF reimplementation of loss_util.py:52-96."""
    rng = np.random.RandomState(1)
    synth = rng.rand(1, 2, 12, 16, 3).astype(np.float32)
    synth[0, 0, 3, 3] = 0.0  # a black (invalid) pixel
    target = rng.rand(1, 12, 16, 3).astype(np.float32)

    ours = np.asarray(photometric_loss_ssim(jnp.asarray(synth),
                                            jnp.asarray(target)))

    x = tf.tile(tf.expand_dims(target, 1), [1, 2, 1, 1, 1])
    y = tf.constant(synth)
    mask = tf.equal(tf.reduce_mean(y, axis=-1, keepdims=True), 0)
    pool = tf.keras.layers.AveragePooling3D([1, 3, 3], strides=1,
                                            padding="SAME")
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    ssim = ((2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)) / \
           ((mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2))
    ssim = tf.clip_by_value((1 - ssim) / 2, 0, 1)
    ssim = tf.where(mask, tf.constant(0.0), ssim)
    theirs = tf.reduce_mean(ssim, axis=[1, 2, 3, 4]).numpy()
    assert np.allclose(ours, theirs, atol=1e-5), np.abs(ours - theirs).max()


def test_bilinear_resize_matches_tf():
    rng = np.random.RandomState(2)
    x = rng.rand(2, 16, 24, 3).astype(np.float32)
    for hw in [(8, 12), (32, 48), (10, 30)]:
        ours = np.asarray(resize_image(jnp.asarray(x), hw[0], hw[1],
                                       "bilinear"))
        theirs = tf.image.resize(x, hw, method="bilinear").numpy()
        assert np.allclose(ours, theirs, atol=2e-3), (
            hw, np.abs(ours - theirs).max())


def test_nearest_resize_matches_tf():
    rng = np.random.RandomState(3)
    x = rng.rand(1, 16, 24, 1).astype(np.float32)
    for hw in [(8, 12), (4, 6)]:
        ours = np.asarray(resize_image(jnp.asarray(x), hw[0], hw[1],
                                       "nearest"))
        theirs = tf.image.resize(x, hw, method="nearest").numpy()
        assert np.allclose(ours, theirs), hw
