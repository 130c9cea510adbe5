import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plsvo_tpu import lie


def random_rotations(rng, n):
    """Uniform-ish random rotations via axis-angle."""
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, np.pi - 0.2, size=(n, 1))
    return np.asarray(lie.so3_exp(jnp.asarray(axes * angles, jnp.float32)))


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(64, 3)).astype(np.float32)
    w *= rng.uniform(0, 2.5, size=(64, 1)).astype(np.float32) / np.linalg.norm(w, axis=-1, keepdims=True)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=2e-5)


def test_so3_exp_small_angle(rng):
    w = (rng.normal(size=(8, 3)) * 1e-6).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    w2 = np.asarray(lie.so3_log(jnp.asarray(R)))
    np.testing.assert_allclose(w2, w, atol=1e-6)


def test_so3_orthonormal(rng):
    w = rng.normal(size=(32, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    RtR = np.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6)).astype(np.float32)
    xi[:, 3:] *= 0.8
    R, t = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_compose_inverse(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 0.5
    R, t = lie.se3_exp(jnp.asarray(xi))
    Ri, ti = lie.inverse(R, t)
    Rc, tc = lie.compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), np.zeros((16, 3)), atol=1e-5)


def test_apply_matches_matrix(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    p = rng.normal(size=(10, 3)).astype(np.float32)
    out = np.asarray(lie.apply(R, t, jnp.asarray(p)))
    expected = p @ np.asarray(R).T + np.asarray(t)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_exp_of_log_composition_consistency(rng):
    """T * exp(-x) then log should be consistent — the GN update pattern
    (reference: src/sparse_img_align.cpp:705-710)."""
    xi = rng.normal(size=(6,)).astype(np.float32) * 0.3
    dx = rng.normal(size=(6,)).astype(np.float32) * 0.01
    R, t = lie.se3_exp(jnp.asarray(xi))
    dR, dt = lie.se3_exp(jnp.asarray(-dx))
    Rn, tn = lie.compose(R, t, dR, dt)
    # applying to a point should differ by ~|dx| * O(point scale)
    p = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    d = np.linalg.norm(np.asarray(lie.apply(Rn, tn, p)) - np.asarray(lie.apply(R, t, p)))
    assert 1e-4 < d < 0.2


def test_reorthonormalize(rng):
    w = rng.normal(size=(8, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    Rn = R + rng.normal(size=R.shape).astype(np.float32) * 1e-3
    Ro = np.asarray(lie.reorthonormalize(jnp.asarray(Rn)))
    RtR = np.einsum("nij,nik->njk", Ro, Ro)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    assert np.abs(Ro - R).max() < 5e-3


def test_distance():
    R0, t0 = lie.identity()
    xi = jnp.asarray([0.1, 0, 0, 0, 0.2, 0], jnp.float32)
    R1, t1 = lie.se3_exp(xi)
    ang, d = lie.distance(R0, t0, R1, t1)
    assert abs(float(ang) - 0.2) < 1e-4


def test_jit_and_vmap():
    f = jax.jit(lie.se3_exp)
    xi = jnp.ones((4, 6), jnp.float32) * 0.1
    R, t = f(xi)
    assert R.shape == (4, 3, 3) and t.shape == (4, 3)
    g = jax.vmap(lambda x: lie.se3_log(*lie.se3_exp(x)))
    out = g(xi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xi), atol=1e-5)
