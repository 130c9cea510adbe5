"""Homography estimation + SE(3) decomposition for two-view bootstrap.

TPU-native replacement of vk::Homography (RANSAC DLT + Faugeras
decomposition) as used by KltHomographyInit::computeHomography
(reference: src/initialization.cpp:217-241). Hypothesis generation and
scoring are fully vectorized (K hypotheses x N correspondences); the final
decomposition of one 3x3 matrix runs on host NumPy (it is a once-per-
bootstrap scalar problem — no reason to force it through XLA).

All image measurements are unit-plane coordinates (x, y) as in vikit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _dlt_4pt(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Direct linear transform from exactly 4 correspondences.

    src, dst: (..., 4, 2). Returns (..., 3, 3) with h22 = 1 (solved via
    8x8 linear system)."""
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, o, z, z, z, -u * x, -u * y], axis=-1)
    rows_v = jnp.stack([z, z, z, x, y, o, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=-2)  # (..., 8, 8)
    b = jnp.concatenate([u, v], axis=-1)[..., None]  # (..., 8, 1)
    det_ok = jnp.abs(jnp.linalg.det(A)) > 1e-12
    A_safe = jnp.where(det_ok[..., None, None], A, jnp.eye(8))
    h = jnp.linalg.solve(A_safe, b)[..., 0]
    H = jnp.concatenate([h, jnp.ones_like(h[..., :1])], axis=-1).reshape(
        *h.shape[:-1], 3, 3)
    return jnp.where(det_ok[..., None, None], H, jnp.eye(3)), det_ok


def _transfer_error(H: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray):
    """One-way transfer error |H(src) - dst| on the unit plane.
    H: (...,3,3); src/dst: (N,2) -> (..., N)."""
    sh = jnp.concatenate([src, jnp.ones_like(src[..., :1])], -1)  # (N,3)
    p = jnp.einsum("...ij,nj->...ni", H, sh)
    w = jnp.where(jnp.abs(p[..., 2]) < 1e-12, 1e-12, p[..., 2])
    proj = p[..., :2] / w[..., None]
    return jnp.linalg.norm(proj - dst, axis=-1)


@jax.jit
def ransac_homography(
    src: jnp.ndarray,  # (N,2) unit-plane coords in ref
    dst: jnp.ndarray,  # (N,2) unit-plane coords in cur
    valid: jnp.ndarray,  # (N,)
    key: jnp.ndarray,
    thresh: jnp.ndarray,  # unit-plane inlier threshold (= px_error/focal)
    n_hyp: int = 256,
):
    """Vectorized RANSAC: n_hyp 4-point hypotheses scored in one shot.
    Returns (H_best (3,3), inlier_mask (N,), n_inliers)."""
    N = src.shape[0]
    # draw only from valid rows: compact valid indices to the front, bound
    # the draw by the (traced) valid count
    order = jnp.argsort(~valid)  # valid rows first, stable
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    draw = jax.random.randint(key, (n_hyp, 4), 0, n_valid)
    idx = order[draw]
    # degenerate draws (repeated idx) are scored anyway and simply lose
    hyp_valid = jnp.all(valid[idx], axis=-1)
    Hs, dlt_ok = _dlt_4pt(src[idx], dst[idx])  # (K,3,3)
    errs = _transfer_error(Hs, src, dst)  # (K,N)
    inl = (errs < thresh) & valid[None, :]
    scores = jnp.sum(inl, axis=-1) * (hyp_valid & dlt_ok)
    best = jnp.argmax(scores)
    H_best = Hs[best]
    inlier_mask = inl[best]
    return H_best, inlier_mask, scores[best]


def decompose_homography(H: np.ndarray, src: np.ndarray, dst: np.ndarray,
                         inliers: np.ndarray):
    """Faugeras SVD decomposition of a unit-plane homography into
    (R, t_normalized, n), picking the physically valid solution with the
    most points in front of both cameras (vk::Homography analogue).

    Host-side NumPy: one 3x3 problem per bootstrap. Returns
    (R_cur_ref, t_cur_ref (unit-norm-ish), n_ref, ok)."""
    U, S, Vt = np.linalg.svd(H)
    d1, d2, d3 = S
    if d1 / d2 < 1.0001 or d2 / d3 < 1.0001:
        # near-pure-rotation: return rotation-only
        R = H / d2
        Ur, _, Vtr = np.linalg.svd(R)
        R = Ur @ Vtr
        if np.linalg.det(R) < 0:
            R = -R
        return R, np.zeros(3), np.array([0.0, 0.0, 1.0]), True

    s = np.linalg.det(U) * np.linalg.det(Vt)
    V = Vt.T
    d1, d2, d3 = d1 / d2, 1.0, d3 / d2

    # Faugeras 1988 closed form (standard enumeration, 8 solutions)
    x1a = np.sqrt(max((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0.0))
    x3a = np.sqrt(max((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0))
    eps = [(1, 1), (1, -1), (-1, 1), (-1, -1)]

    candidates = []
    # case d' = +d2
    for e1, e3 in eps:
        x1, x3 = e1 * x1a, e3 * x3a
        sin_t = (d1 - d3) * x1 * x3 / d2
        cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / d2
        Rp = np.array([[cos_t, 0, -sin_t], [0, 1, 0], [sin_t, 0, cos_t]])
        tp = (d1 - d3) * np.array([x1, 0.0, -x3])
        np_ = np.array([x1, 0.0, x3])
        candidates.append((s * U @ Rp @ Vt, U @ tp, V @ np_))
    # case d' = -d2
    for e1, e3 in eps:
        x1, x3 = e1 * x1a, e3 * x3a
        sin_p = (d1 + d3) * x1 * x3 / d2
        cos_p = (d3 * x1 * x1 - d1 * x3 * x3) / d2
        Rp = np.array([[cos_p, 0, sin_p], [0, -1, 0], [sin_p, 0, -cos_p]])
        tp = (d1 + d3) * np.array([x1, 0.0, x3])
        np_ = np.array([x1, 0.0, x3])
        candidates.append((s * U @ Rp @ Vt, U @ tp, V @ np_))

    src_in = src[inliers]
    dst_in = dst[inliers]
    best = None
    best_score = -1
    for R, t, n in candidates:
        if np.linalg.det(R) < 0:
            continue
        # cheirality: depths positive in both views for triangulated inliers
        good = 0
        for a, b in zip(src_in[:50], dst_in[:50]):
            fa = np.array([a[0], a[1], 1.0])
            fa /= np.linalg.norm(fa)
            fb = np.array([b[0], b[1], 1.0])
            fb /= np.linalg.norm(fb)
            A = np.stack([R @ fa, -fb], axis=-1)
            x, *_ = np.linalg.lstsq(A, -t, rcond=None)
            if x[0] > 0 and x[1] > 0:
                good += 1
        if good > best_score:
            best_score = good
            best = (R, t, n)
    if best is None:
        return np.eye(3), np.zeros(3), np.array([0.0, 0, 1.0]), False
    R, t, n = best
    # orient the plane normal toward the reference camera
    if n[2] < 0:
        n = -n
    return R, t, n, True


class InitResult(NamedTuple):
    R_cur_ref: np.ndarray
    t_cur_ref: np.ndarray
    inliers: np.ndarray  # (N,) bool
    depths_ref: np.ndarray  # (N,) triangulated ref-frame ranges (0 where invalid)
    ok: bool


def homography_init(
    f_ref: np.ndarray,  # (N,3) unit bearings in ref
    f_cur: np.ndarray,  # (N,3) unit bearings in cur
    valid: np.ndarray,
    *,
    focal: float,
    reproj_thresh_px: float = 2.0,
    seed: int = 0,
    min_inliers: int = 30,
) -> InitResult:
    """Full bootstrap: RANSAC H on unit-plane coords, decomposition,
    triangulation of inliers (reference: initialization.cpp:217-241 +
    map scale fix applied by the caller)."""
    from plsvo_tpu.ops.matcher import triangulate_depth

    src = (f_ref[:, :2] / f_ref[:, 2:3]).astype(np.float32)
    dst = (f_cur[:, :2] / f_cur[:, 2:3]).astype(np.float32)
    key = jax.random.PRNGKey(seed)
    H, inl, n_in = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid), key,
        jnp.asarray(reproj_thresh_px / focal, jnp.float32))
    inl = np.asarray(inl)
    if int(n_in) < min_inliers:
        return InitResult(np.eye(3), np.zeros(3), inl, np.zeros(len(src)), False)
    R, t, n, ok = decompose_homography(np.asarray(H), src, dst, inl)
    if not ok:
        return InitResult(np.eye(3), np.zeros(3), inl, np.zeros(len(src)), False)
    d_ref, d_cur, tri_ok = triangulate_depth(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.asarray(f_ref, jnp.float32), jnp.asarray(f_cur, jnp.float32))
    tri_ok = np.asarray(tri_ok) & inl
    depths = np.where(tri_ok, np.asarray(d_ref), 0.0)
    return InitResult(R, t, tri_ok, depths, True)
