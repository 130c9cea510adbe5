"""SO(3)/SE(3) Lie-group math, batched and jit-friendly.

TPU-native replacement for the reference's Sophus dependency
(reference: include/plsvo/frame.h:62 uses Sophus::SE3 for T_f_w_;
src/sparse_img_align.cpp:705-710 composes T * SE3::exp(-x)).

Representation: an SE(3) element is a pytree ``(R, t)`` with
``R: (..., 3, 3)`` rotation matrices and ``t: (..., 3)`` translations.
All functions broadcast over leading batch dimensions so the same code
serves one pose or a table of keyframe poses.

Float32 throughout (TPU-native); tests validate round-trips at f64 on CPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (...,3) -> (...,3,3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, Taylor-safe near theta=0. (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = hat(w)
    W2 = W @ W
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallback
    small = theta2 < _EPS
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A * W + B * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map (...,3,3) -> (...,3). Handles theta near 0 and near pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Generic: w = theta/(2 sin theta) * vee(R - R^T)
    sin_theta = jnp.sin(theta)
    w_asym = vee(R - jnp.swapaxes(R, -1, -2))
    small = theta[..., None] < 1e-4
    near_pi = (jnp.pi - theta[..., None]) < 1e-4
    scale_generic = theta[..., None] / jnp.where(
        jnp.abs(sin_theta[..., None]) < _EPS, 1.0, 2.0 * sin_theta[..., None]
    )
    scale_small = 0.5 + theta[..., None] ** 2 / 12.0
    w_generic = jnp.where(small, scale_small, scale_generic) * w_asym
    # Near pi: use diagonal of R to recover axis magnitudes.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag - cos_theta[..., None]) / jnp.maximum(1.0 - cos_theta[..., None], _EPS), 0.0)
    axis = jnp.sqrt(axis2)
    # Fix signs from the off-diagonal sums (R + R^T)
    sym = R + jnp.swapaxes(R, -1, -2)
    sign_x = jnp.sign(jnp.where(jnp.abs(w_asym[..., 0]) > _EPS, w_asym[..., 0], 1.0))
    sign_y = jnp.where(sym[..., 0, 1] >= 0, sign_x, -sign_x)
    sign_z = jnp.where(sym[..., 0, 2] >= 0, sign_x, -sign_x)
    axis_signed = axis * jnp.stack([sign_x, sign_y, sign_z], axis=-1)
    w_pi = theta[..., None] * axis_signed / jnp.maximum(
        jnp.linalg.norm(axis_signed, axis=-1, keepdims=True), _EPS
    )
    return jnp.where(near_pi, w_pi, w_generic)


def _left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V used in SE(3) exp: (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    C = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B * W + C * W2


def _left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.where(small, 1.0, jnp.sin(half_theta)))
        / jnp.where(small, 1.0, theta2),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + cot_term * W2


def se3_exp(xi: jnp.ndarray):
    """SE(3) exp map. xi = (..., 6) as [v(3), w(3)] (translation first, matching
    the reference's jacobian_xyz2uv column order, include/plsvo/frame.h:138-160).
    Returns (R, t)."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = _left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log map -> (..., 6) [v, w]."""
    w = so3_log(R)
    Vinv = _left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


def compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb): first apply b, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def apply(R, t, p):
    """Transform points p: (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def identity(dtype=jnp.float32, batch_shape=()):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    t = jnp.zeros(batch_shape + (3,), dtype=dtype)
    return R, t


def reorthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation back onto SO(3) via Gram-Schmidt.

    Cheap drift control after long chains of `compose` (the reference relies
    on Sophus' quaternion normalization for the same purpose)."""
    x = R[..., 0, :]
    y = R[..., 1, :]
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), _EPS)
    y = y - jnp.sum(x * y, axis=-1, keepdims=True) * x
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), _EPS)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=-2)


def distance(Ra, ta, Rb, tb):
    """(rotation angle rad, translation norm) between two poses."""
    Rrel, trel = compose(*inverse(Ra, ta), Rb, tb)
    ang = jnp.linalg.norm(so3_log(Rrel), axis=-1)
    return ang, jnp.linalg.norm(trel, axis=-1)
