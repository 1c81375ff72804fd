"""Golden tests for SE(3) twist<->matrix conversions.

Ports the analytic assertions of /root/reference/utils/convert_pose.py:197-281
(round-trips, translation/angle preservation) plus convention checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xpt_mde_tpu.utils import se3


def random_twists(shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-scale, scale, shape).astype(np.float32))


def test_twist_to_matrix_translation_and_angle():
    twists = random_twists((8, 4, 6), seed=3)
    mats = se3.twist_to_matrix(twists)
    assert mats.shape == (8, 4, 4, 4)
    pose0 = np.asarray(twists[3, 2])
    mat0 = np.asarray(mats[3, 2])
    # translation preserved
    assert np.allclose(pose0[:3], mat0[:3, 3], atol=1e-6)
    # rotation angle preserved
    angle_mat = np.arccos(np.clip((np.trace(mat0[:3, :3]) - 1) / 2, -1, 1))
    angle_vec = np.linalg.norm(pose0[3:])
    assert np.isclose(angle_vec, angle_mat, atol=1e-5)
    # proper rotation
    rot = mat0[:3, :3]
    assert np.allclose(rot @ rot.T, np.eye(3), atol=1e-5)
    assert np.isclose(np.linalg.det(rot), 1.0, atol=1e-5)


def test_twist_matrix_roundtrip():
    twists = random_twists((8, 4, 6), seed=7)
    mats = se3.twist_to_matrix(twists)
    twists_again = se3.matrix_to_twist(mats)
    assert np.allclose(np.asarray(twists), np.asarray(twists_again), atol=1e-5)


def test_zero_rotation_is_identity():
    twist = jnp.array([[1.0, 2.0, 3.0, 0.0, 0.0, 0.0]])
    mat = se3.twist_to_matrix(twist)
    assert np.allclose(np.asarray(mat[0, :3, :3]), np.eye(3), atol=1e-7)
    assert np.allclose(np.asarray(mat[0, :3, 3]), [1, 2, 3], atol=1e-7)


def test_reference_sign_convention():
    """The reference uses the transposed-skew Rodrigues formula
    (convert_pose.py:53-56): R(u, th) = R_standard(u, th)^T."""
    theta = np.pi / 6
    twist = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.0, theta]])  # rotation about z
    mat = np.asarray(se3.twist_to_matrix(twist))[0]
    c, s = np.cos(theta), np.sin(theta)
    r_standard = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    assert np.allclose(mat[:3, :3], r_standard.T, atol=1e-6)


def test_invert_matrix():
    twists = random_twists((4, 3, 6), seed=11)
    mats = se3.twist_to_matrix(twists)
    inv = se3.invert_matrix(mats)
    prod = np.asarray(mats @ inv)
    assert np.allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)


def test_gradients_finite_at_small_angles():
    """Small-angle branch must not produce NaN gradients under jit."""
    import jax

    def loss(twist):
        return jnp.sum(se3.twist_to_matrix(twist) ** 2)

    for angle in [0.0, 1e-9, 1e-4]:
        twist = jnp.array([[0.1, 0.2, 0.3, angle, 0.0, 0.0]])
        g = jax.jit(jax.grad(loss))(twist)
        assert np.isfinite(np.asarray(g)).all(), f"NaN grad at angle={angle}"


def test_numpy_variants_match():
    twists = np.random.RandomState(5).uniform(-1, 1, (2, 3, 6)).astype(np.float32)
    mats = se3.twist_to_matrix_np(twists)
    assert np.allclose(mats, np.asarray(se3.twist_to_matrix(jnp.asarray(twists))))
    back = se3.matrix_to_twist_np(mats)
    assert np.allclose(back, twists, atol=1e-5)


def test_matrix_to_twist_grad_finite_at_identity():
    """arccos'(1) is infinite; the strict-interior clip must keep
    gradients finite (zero) at identity and theta~pi rotations."""
    import jax

    def f(m):
        return jnp.sum(se3.matrix_to_twist(m) ** 2)

    g_ident = jax.grad(f)(jnp.eye(4))
    assert np.all(np.isfinite(np.asarray(g_ident)))
    # 180-degree rotation about z
    m_pi = np.eye(4, dtype=np.float32)
    m_pi[0, 0] = m_pi[1, 1] = -1.0
    g_pi = jax.grad(f)(jnp.asarray(m_pi))
    assert np.all(np.isfinite(np.asarray(g_pi)))


def test_numpy_twins_match_jax_and_stay_on_host():
    rng = np.random.RandomState(0)
    twist = rng.uniform(-0.5, 0.5, (4, 6)).astype(np.float64)
    mat_np = se3.twist_to_matrix_np(twist)
    assert isinstance(mat_np, np.ndarray) and mat_np.dtype == np.float64
    mat_jx = np.asarray(se3.twist_to_matrix(jnp.asarray(twist, jnp.float32)))
    np.testing.assert_allclose(mat_np, mat_jx, atol=1e-6)
    back = se3.matrix_to_twist_np(mat_np)
    np.testing.assert_allclose(back, twist, atol=1e-6)
