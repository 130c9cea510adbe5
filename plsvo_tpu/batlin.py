"""Closed-form batched small-matrix linear algebra.

`jnp.linalg.inv`/`solve` on batched 2x2/3x3 matrices lower to general LU
kernels on TPU — measured ~0.5 ms for 768 3x3 inverses, dominating the
alignment-prefix cost (scratch: pallas-align investigation). Adjugate
closed forms are pure elementwise VPU math and fuse into the surrounding
program. All functions broadcast over leading batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp


def inv2x2(A: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Adjugate inverse of (..., 2, 2); `eps` is added to the diagonal
    first (ridge), matching inv(A + eps*I)."""
    a = A[..., 0, 0] + eps
    b = A[..., 0, 1]
    c = A[..., 1, 0]
    d = A[..., 1, 1] + eps
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    inv = jnp.stack([
        jnp.stack([d, -b], -1),
        jnp.stack([-c, a], -1),
    ], -2)
    return inv / det[..., None, None]


def inv3x3(A: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Adjugate inverse of (..., 3, 3) (+ eps ridge on the diagonal)."""
    a = A[..., 0, 0] + eps
    b = A[..., 0, 1]
    c = A[..., 0, 2]
    d = A[..., 1, 0]
    e = A[..., 1, 1] + eps
    f = A[..., 1, 2]
    g = A[..., 2, 0]
    h = A[..., 2, 1]
    i = A[..., 2, 2] + eps
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([A00, A01, A02], -1),
        jnp.stack([A10, A11, A12], -1),
        jnp.stack([A20, A21, A22], -1),
    ], -2)
    return adj / det[..., None, None]


def solve3x3(A: jnp.ndarray, b: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """x = (A + eps*I)^-1 b for (..., 3, 3) and (..., 3) via the adjugate."""
    return jnp.einsum("...ij,...j->...i", inv3x3(A, eps), b)


def solve_psd(A: jnp.ndarray, b: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """x = (A + eps*I)^-1 b for a SINGLE small symmetric positive-definite
    system (e.g. the 6x6 GN normal equations) via fully unrolled Cholesky.

    jnp.linalg.solve on a lone 6x6 dispatches a general LU kernel each GN
    iteration (~several us on TPU); the unrolled scalar graph fuses into
    the iteration body. Returns NaNs when A is not PD (callers already
    treat NaN steps as 'bad' and stop/rollback, matching vikit)."""
    n = A.shape[-1]
    a = [[A[i, j] + (eps if i == j else 0.0) for j in range(n)]
         for i in range(n)]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)
