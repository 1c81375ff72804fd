"""Photometric reconstruction losses with black-pixel masking.

Behavioral spec from /root/reference/model/loss_and_metric/loss_util.py:5-96:

- synthesized pixels whose gray mean is exactly 0 are invalid (out-of-view
  or zero-depth warps produce pure black) and contribute zero error;
- SSIM uses 3x3 mean windows with SAME padding where padded positions are
  EXCLUDED from the average (TF avg-pool semantics), c1=0.01^2, c2=0.03^2,
  and the final score is clip((1-ssim)/2, 0, 1).

All functions take
    synth_target [batch, numsrc, H, W, C], orig_target [batch, H, W, C]
and return [batch] when ``reduce`` else [batch, numsrc, H, W, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _error_mask(synth_target: jnp.ndarray) -> jnp.ndarray:
    """True where the synthesized pixel is black (invalid warp)."""
    gray = jnp.mean(synth_target, axis=-1, keepdims=True)
    return gray == 0


def photometric_loss_l1(synth_target: jnp.ndarray, orig_target: jnp.ndarray,
                        reduce: bool = True) -> jnp.ndarray:
    orig = orig_target[:, None]
    err = jnp.abs(synth_target - orig)
    err = jnp.where(_error_mask(synth_target), 0.0, err)
    if reduce:
        return jnp.mean(err, axis=(1, 2, 3, 4))
    return err


def photometric_loss_l2(synth_target: jnp.ndarray, orig_target: jnp.ndarray,
                        reduce: bool = True) -> jnp.ndarray:
    orig = orig_target[:, None]
    err = jnp.square(synth_target - orig)
    err = jnp.where(_error_mask(synth_target), 0.0, err)
    if reduce:
        return jnp.mean(err, axis=(1, 2, 3, 4))
    return err


def _sum3(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Sum of each length-3 window along ``axis`` (SAME, zero-padded)."""
    n = x.shape[axis]
    pad = [(1, 1) if a == axis else (0, 0) for a in range(x.ndim)]
    p = jnp.pad(x, pad)
    return (jax.lax.slice_in_dim(p, 0, n, axis=axis)
            + jax.lax.slice_in_dim(p, 1, n + 1, axis=axis)
            + jax.lax.slice_in_dim(p, 2, n + 2, axis=axis))


def _edge_counts(n: int) -> np.ndarray:
    """Valid-neighbor count per position of a length-3 SAME window."""
    c = np.full(n, 3.0, np.float32)
    c[0] -= 1.0
    c[-1] -= 1.0
    return np.maximum(c, 1.0)


def avg_pool_3x3_same(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 mean pool over the (H, W) axes of [..., H, W, C], SAME padding,
    excluding padded positions from the average (TF pooling semantics --
    interior pixels average 9 neighbors, corners average 4).

    Implemented as a separable shift-add (zero-padded 3-sums along H then
    W) divided by a compile-time count map: TPU's reduce_window lowering
    costs ~1.8 ms/step here, while shifted adds fuse into the surrounding
    elementwise work."""
    h, w = x.shape[-3], x.shape[-2]
    summed = _sum3(_sum3(x, x.ndim - 3), x.ndim - 2)
    counts = jnp.asarray(np.outer(_edge_counts(h), _edge_counts(w))[..., None],
                         dtype=x.dtype)
    return summed / counts


def photometric_loss_ssim(synth_target: jnp.ndarray, orig_target: jnp.ndarray,
                          reduce: bool = True) -> jnp.ndarray:
    x = jnp.broadcast_to(orig_target[:, None], synth_target.shape)
    y = synth_target
    mask = _error_mask(synth_target)

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    # target-only pools run on [B,H,W,C] and broadcast after -- the
    # numsrc copies are identical, no need to pool them numsrc times
    mu_x_t = avg_pool_3x3_same(orig_target)
    sigma_x_t = avg_pool_3x3_same(orig_target ** 2) - mu_x_t ** 2
    mu_x = jnp.broadcast_to(mu_x_t[:, None], synth_target.shape)
    sigma_x = jnp.broadcast_to(sigma_x_t[:, None], synth_target.shape)
    mu_y = avg_pool_3x3_same(y)
    sigma_y = avg_pool_3x3_same(y ** 2) - mu_y ** 2
    sigma_xy = avg_pool_3x3_same(x * y) - mu_x * mu_y

    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    ssim = ssim_n / ssim_d
    ssim = jnp.clip((1.0 - ssim) / 2.0, 0.0, 1.0)
    ssim = jnp.where(mask, 0.0, ssim)
    if reduce:
        return jnp.mean(ssim, axis=(1, 2, 3, 4))
    return ssim


PHOTOMETRIC_FNS = {
    "L1": photometric_loss_l1,
    "L2": photometric_loss_l2,
    "SSIM": photometric_loss_ssim,
}
