"""SE(3) twist <-> matrix conversions, fully batched for JAX.

Pose convention (matches the reference framework's behavioral spec,
/root/reference/utils/convert_pose.py:32-191):

- A "twist" is ``(tx, ty, tz, u1, u2, u3)`` where ``(u1,u2,u3)`` is an
  axis-angle rotation vector (angle = norm).
- The rotation matrix uses the reference's *transposed-skew* Rodrigues
  formula: ``R = I + K^T sin(th) + (K^T)^2 (1 - cos(th))`` with
  ``K = [[0,-u3,u2],[u3,0,-u1],[-u2,u1,0]]`` the standard skew operator
  of the *normalized* axis. Equivalently ``R = R_standard(u, th)^T``.
  This sign choice is load-bearing: predicted poses, pose GT conversion
  and the pose metrics all share it, so we reproduce it exactly.
- Poses used in view synthesis transform points from the *target* frame
  to a *source* frame.

Everything here is pure jax.numpy, shape-polymorphic over leading batch
dims, and safe under jit/vmap/grad (small-angle branches via where, no
data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SMALL_ANGLE = 1e-8
_SMALL_THETA = 1e-5


def twist_to_matrix(twist: jnp.ndarray) -> jnp.ndarray:
    """Convert twist vectors to 4x4 transform matrices.

    :param twist: [..., 6] = (tx, ty, tz, u1, u2, u3)
    :return: [..., 4, 4] transformation matrices
    """
    trans = twist[..., :3]
    uvec = twist[..., 3:]
    # angle of rotation [..., 1]; the norm is computed through a guarded
    # square so the gradient at exactly-zero rotation is finite (norm's
    # gradient at 0 is NaN, and `where` alone doesn't block NaN cotangents
    # flowing through the discarded branch)
    sq = jnp.sum(uvec * uvec, axis=-1, keepdims=True)
    is_small = sq < _SMALL_ANGLE ** 2
    theta = jnp.sqrt(jnp.where(is_small, 1.0, sq))
    axis = uvec / theta
    w1, w2, w3 = axis[..., 0], axis[..., 1], axis[..., 2]
    z = jnp.zeros_like(w1)
    # transposed skew matrix (reference sign convention)
    k = jnp.stack(
        [
            jnp.stack([z, w3, -w2], axis=-1),
            jnp.stack([-w3, z, w1], axis=-1),
            jnp.stack([w2, -w1, z], axis=-1),
        ],
        axis=-2,
    )  # [..., 3, 3]
    th = theta[..., None]  # [..., 1, 1]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=twist.dtype), k.shape)
    kk = jnp.matmul(k, k, precision=jax.lax.Precision.HIGHEST)
    rot = eye + k * jnp.sin(th) + kk * (1.0 - jnp.cos(th))
    rot = jnp.where(is_small[..., None], eye, rot)

    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)  # [..., 3, 4]
    last = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=twist.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, last], axis=-2)


def matrix_to_twist(matrix: jnp.ndarray) -> jnp.ndarray:
    """Convert 4x4 transform matrices to twist vectors.

    Inverse of :func:`twist_to_matrix` (same transposed-skew convention,
    mirrors /root/reference/utils/convert_pose.py:151-168).

    :param matrix: [..., 4, 4]
    :return: [..., 6] = (tx, ty, tz, u1, u2, u3)
    """
    rot = matrix[..., :3, :3]
    trace = jnp.trace(rot, axis1=-2, axis2=-1)
    # clip strictly INSIDE (-1, 1): arccos has an infinite derivative at
    # +-1 and `where` downstream cannot block the NaN cotangent (0*inf).
    # Values are unaffected (near identity the axis vector is ~0, so
    # rvec ~ axis/2 either way; clip zeroes the gradient at the boundary
    # instead of NaN-ing it); theta=pi rotations are inherently
    # degenerate in this parametrization either way.
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)[..., None]  # [..., 1]
    axis = jnp.stack(
        [
            rot[..., 1, 2] - rot[..., 2, 1],
            rot[..., 2, 0] - rot[..., 0, 2],
            rot[..., 0, 1] - rot[..., 1, 0],
        ],
        axis=-1,
    )  # [..., 3]
    small = jnp.abs(theta) < _SMALL_THETA
    sin_theta = jnp.where(small, 1.0, jnp.sin(theta))
    rvec = jnp.where(small, axis / 2.0, axis / (2.0 * sin_theta) * theta)
    trans = matrix[..., :3, 3]
    return jnp.concatenate([trans, rvec], axis=-1)


def invert_matrix(matrix: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid transforms analytically: inv([R t]) = [R^T, -R^T t].

    Cheaper and better conditioned than a general 4x4 inverse; rigid
    transforms are the only matrices this framework inverts on device.
    """
    rot = matrix[..., :3, :3]
    trans = matrix[..., :3, 3:]
    rot_t = jnp.swapaxes(rot, -1, -2)
    top = jnp.concatenate(
        [rot_t, -jnp.matmul(rot_t, trans, precision=jax.lax.Precision.HIGHEST)],
        axis=-1)
    last = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=matrix.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, last], axis=-2)


# ---------------------------------------------------------------------------
# numpy variants (host-side data prep / evaluation use these; identical math)


def twist_to_matrix_np(twist: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`twist_to_matrix`: genuinely host-side (no
    device dispatch/compile from evaluation loops) and float64-capable."""
    twist = np.asarray(twist)
    dtype = twist.dtype if twist.dtype.kind == "f" else np.float64
    trans = twist[..., :3].astype(dtype)
    uvec = twist[..., 3:].astype(dtype)
    theta = np.linalg.norm(uvec, axis=-1, keepdims=True)
    safe = np.where(theta < _SMALL_ANGLE, 1.0, theta)
    w1, w2, w3 = np.moveaxis(uvec / safe, -1, 0)
    z = np.zeros_like(w1)
    k = np.stack([np.stack([z, w3, -w2], -1),
                  np.stack([-w3, z, w1], -1),
                  np.stack([w2, -w1, z], -1)], -2)
    th = theta[..., None]
    eye = np.broadcast_to(np.eye(3, dtype=dtype), k.shape)
    rot = eye + k * np.sin(th) + (k @ k) * (1.0 - np.cos(th))
    rot = np.where(th < _SMALL_ANGLE, eye, rot)
    out = np.zeros(twist.shape[:-1] + (4, 4), dtype)
    out[..., :3, :3] = rot
    out[..., :3, 3] = trans
    out[..., 3, 3] = 1.0
    return out


def matrix_to_twist_np(matrix: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`matrix_to_twist` (same conventions)."""
    matrix = np.asarray(matrix)
    dtype = matrix.dtype if matrix.dtype.kind == "f" else np.float64
    rot = matrix[..., :3, :3].astype(dtype)
    trace = np.trace(rot, axis1=-2, axis2=-1)
    cos_theta = np.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos_theta)[..., None]
    axis = np.stack([rot[..., 1, 2] - rot[..., 2, 1],
                     rot[..., 2, 0] - rot[..., 0, 2],
                     rot[..., 0, 1] - rot[..., 1, 0]], -1)
    small = np.abs(theta) < _SMALL_THETA
    sin_theta = np.where(small, 1.0, np.sin(theta))
    rvec = np.where(small, axis / 2.0, axis / (2.0 * sin_theta) * theta)
    return np.concatenate([matrix[..., :3, 3].astype(dtype), rvec], -1)
