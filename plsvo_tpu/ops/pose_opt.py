"""Motion-only pose optimization (6-DoF GN on reprojection errors).

TPU-native rebuild of pose_optimizer::optimizeGaussNewton
(reference: src/pose_optimizer.cpp:39-258). Batched residual/Jacobian
evaluation over the whole feature table per GN iteration; the 6x6 system is
assembled with one matmul.

Parity:
- point residual: unit-plane bearing-vs-projection, scaled 1/2^level
  (pose_optimizer.cpp:111-129)
- line residual: signed distances of both projected endpoints to the
  observed infinite 2D line e = (l.s_proj, l.e_proj), scaled 1/2^level
  (pose_optimizer.cpp:132-167)
- Tukey weights on e.norm()/scale with MAD scales estimated once before
  iterating, separately for points and lines (pose_optimizer.cpp:58-102)
- chi2-increase rollback, update T <- exp(dT) * T (left compose,
  pose_optimizer.cpp:173-190)
- covariance = (A * focal^2)^-1 (pose_optimizer.cpp:197-199)
- outlier stripping at reproj_thresh/focal, with the line threshold scaled
  by scale_ls/scale_pt (pose_optimizer.cpp:201-242)

Divergence (intentional fix): the reference scales BOTH endpoint Jacobian
rows by ds/||e|| (pose_optimizer.cpp:157-158, noted in SURVEY §2 C13 as a
bug); we use the exact Jacobian rows [l^T J_s ; l^T J_e].
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from plsvo_tpu import lie
from plsvo_tpu.ops.sparse_align import jacobian_xyz2uv

_TUKEY_B = 4.6851  # vk::robust_cost::TukeyWeightFunction default width


def tukey_weight(x_norm: jnp.ndarray) -> jnp.ndarray:
    """Tukey biweight w(x) = (1 - (x/b)^2)^2 for |x|<b else 0."""
    u = x_norm / _TUKEY_B
    w = (1.0 - u * u)
    return jnp.where(jnp.abs(u) < 1.0, w * w, 0.0)


def tukey_rho(x_norm: jnp.ndarray) -> jnp.ndarray:
    """Tukey loss rho(x) = (b^2/6)(1-(1-(x/b)^2)^3), saturating at b^2/6.

    Monotone in |x| — unlike the weighted square w(x)x^2, which DECREASES
    when a moderately-large residual grows (redescending psi). The iteration
    monitor must therefore track rho, not w*x^2; the reference tracks w*x^2
    (pose_optimizer.cpp:128,166) and can roll back genuinely-improving
    steps."""
    u2 = (x_norm / _TUKEY_B) ** 2
    c = _TUKEY_B * _TUKEY_B / 6.0
    v = 1.0 - jnp.minimum(u2, 1.0)
    return c * (1.0 - v * v * v)


def mad_scale(errors: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """1.48 * median(|e|) over valid entries (vk::robust_cost::MADScaleEstimator)."""
    x = jnp.where(valid, errors, jnp.nan)
    med = jnp.nanmedian(x)
    med = jnp.where(jnp.isnan(med), 1.0, med)
    return jnp.maximum(1.48 * med, 1e-6)


class PoseOptInputs(NamedTuple):
    # points
    pt_f: jnp.ndarray  # (N,3) observed unit bearings
    pt_level: jnp.ndarray  # (N,) detection pyramid level
    pt_pos_w: jnp.ndarray  # (N,3) landmark world positions
    pt_valid: jnp.ndarray  # (N,)
    # line segments
    seg_line: jnp.ndarray  # (M,3) observed 2D line coeffs (unit-plane homog.)
    seg_level: jnp.ndarray  # (M,)
    seg_spos_w: jnp.ndarray  # (M,3)
    seg_epos_w: jnp.ndarray  # (M,3)
    seg_valid: jnp.ndarray  # (M,)


class PoseOptResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    cov: jnp.ndarray  # (6,6)
    pt_inlier: jnp.ndarray  # (N,) survivors of outlier stripping
    seg_inlier: jnp.ndarray  # (M,)
    n_obs_pt: jnp.ndarray
    n_obs_seg: jnp.ndarray
    scale_pt: jnp.ndarray
    scale_seg: jnp.ndarray
    chi2: jnp.ndarray


def _pt_errors(R, t, inp: PoseOptInputs):
    xyz_f = jnp.einsum("ij,nj->ni", R, inp.pt_pos_w) + t
    z = jnp.where(jnp.abs(xyz_f[:, 2]) < 1e-10, 1e-10, xyz_f[:, 2])
    proj = xyz_f[:, :2] / z[:, None]
    obs = inp.pt_f[:, :2] / jnp.where(
        jnp.abs(inp.pt_f[:, 2:3]) < 1e-10, 1e-10, inp.pt_f[:, 2:3])
    sic = 1.0 / (1 << inp.pt_level).astype(jnp.float32)
    e = (obs - proj) * sic[:, None]  # (N,2)
    return xyz_f, e, sic


def _seg_errors(R, t, inp: PoseOptInputs):
    def endpoint(pos_w):
        xyz = jnp.einsum("ij,mj->mi", R, pos_w) + t
        z = jnp.where(jnp.abs(xyz[:, 2]) < 1e-10, 1e-10, xyz[:, 2])
        proj_h = jnp.stack([xyz[:, 0] / z, xyz[:, 1] / z, jnp.ones_like(z)], -1)
        return xyz, proj_h

    xyz_s, s_proj = endpoint(inp.seg_spos_w)
    xyz_e, e_proj = endpoint(inp.seg_epos_w)
    ds = jnp.sum(inp.seg_line * s_proj, axis=-1)
    de = jnp.sum(inp.seg_line * e_proj, axis=-1)
    sic = 1.0 / (1 << inp.seg_level).astype(jnp.float32)
    e = jnp.stack([ds, de], -1) * sic[:, None]  # (M,2)
    return xyz_s, xyz_e, e, sic


@partial(jax.jit, static_argnames=("n_iter", "n_iter_ref"))
def optimize_pose(
    inp: PoseOptInputs,
    R_init: jnp.ndarray,
    t_init: jnp.ndarray,
    focal: jnp.ndarray,
    *,
    n_iter: int = 10,
    n_iter_ref: int = 0,
    reproj_thresh: float = 2.0,
) -> PoseOptResult:
    """n_iter_ref > 0 adds the reference's second-overload refinement
    phase: after outlier stripping, the SAME robust GN runs n_iter_ref more
    iterations over the surviving inliers only (pose_optimizer.cpp:469-563;
    the reference pipeline itself calls the first overload,
    frame_handler_mono.cpp:327-329, so the default is off)."""
    f32 = jnp.float32
    R0, t0 = R_init.astype(f32), t_init.astype(f32)

    # --- MAD scales estimated once at the initial pose, as in the reference
    # (pose_optimizer.cpp:58-102) ---
    _, e_pt0, _ = _pt_errors(R0, t0, inp)
    scale_pt0 = mad_scale(jnp.linalg.norm(e_pt0, axis=-1), inp.pt_valid)
    _, _, e_sg0, _ = _seg_errors(R0, t0, inp)
    seg_has = jnp.any(inp.seg_valid)
    scale_sg0 = jnp.where(
        seg_has, mad_scale(jnp.linalg.norm(e_sg0, axis=-1), inp.seg_valid), 1.0)
    scale_pt = scale_pt0
    scale_sg = scale_sg0

    def system(R, t, pt_valid, seg_valid):
        xyz_pt, e_pt, sic_pt = _pt_errors(R, t, inp)
        en_pt = jnp.linalg.norm(e_pt, axis=-1)
        J_pt = jacobian_xyz2uv(xyz_pt) * sic_pt[:, None, None]  # (N,2,6)
        w_pt = tukey_weight(en_pt / scale_pt) * pt_valid

        xyz_s, xyz_e, e_sg, sic_sg = _seg_errors(R, t, inp)
        l_aux = inp.seg_line[:, :2]  # (M,2)
        Js = jacobian_xyz2uv(xyz_s) * sic_sg[:, None, None]
        Je = jacobian_xyz2uv(xyz_e) * sic_sg[:, None, None]
        # Sign: point residual is obs - proj, so de/dxi = jacobian_xyz2uv
        # (which already carries a minus); the line residual is +l.proj with
        # no obs-minus, so de/dxi = -l_aux^T jacobian_xyz2uv. The reference
        # omits this flip (pose_optimizer.cpp:159-163) — its line term
        # pushes the wrong way and only survives thanks to Tukey weighting;
        # we use the correct sign (validated by finite differences in
        # tests/test_pose_opt.py).
        row_s = -jnp.einsum("mi,mik->mk", l_aux, Js)  # (M,6)
        row_e = -jnp.einsum("mi,mik->mk", l_aux, Je)
        J_sg = jnp.stack([row_s, row_e], axis=1)  # (M,2,6)
        en_sg = jnp.linalg.norm(e_sg, axis=-1)
        w_sg = tukey_weight(en_sg / scale_sg) * seg_valid

        A = (
            jnp.einsum("nik,nil,n->kl", J_pt, J_pt, w_pt)
            + jnp.einsum("mik,mil,m->kl", J_sg, J_sg, w_sg)
        )
        b = -(
            jnp.einsum("nik,ni,n->k", J_pt, e_pt, w_pt)
            + jnp.einsum("mik,mi,m->k", J_sg, e_sg, w_sg)
        )
        # monitor the actual robust cost (see tukey_rho docstring)
        chi2 = (
            jnp.sum(jnp.where(pt_valid, tukey_rho(en_pt / scale_pt), 0.0))
            + jnp.sum(jnp.where(seg_valid, tukey_rho(en_sg / scale_sg), 0.0))
        )
        return A, b, chi2

    def run_gn(R0_, t0_, pt_valid, seg_valid, iters):
        def cond(c):
            it, stop, *_ = c
            return (it < iters) & ~stop

        def body(c):
            it, stop, R, t, R_old, t_old, chi2_prev, A_last = c
            A, b, chi2 = system(R, t, pt_valid, seg_valid)
            from plsvo_tpu.batlin import solve_psd
            dT = solve_psd(A, b, 1e-10)
            bad = jnp.any(jnp.isnan(dT))
            worse = (it > 0) & (chi2 > chi2_prev)
            stop_new = worse | bad | (jnp.max(jnp.abs(dT)) < 1e-10)
            dR, dt = lie.se3_exp(dT)
            # left-compose: T_new = exp(dT) * T (pose_optimizer.cpp:183)
            R_new, t_new = lie.compose(dR, dt, R, t)
            R_o = jnp.where(worse | bad, R_old, R)
            t_o = jnp.where(worse | bad, t_old, t)
            R_next = jnp.where(worse | bad, R_o, R_new)
            t_next = jnp.where(worse | bad, t_o, t_new)
            chi2_keep = jnp.where(worse, chi2_prev, chi2)
            A_keep = jnp.where(worse, A_last, A)
            return (it + 1, stop_new, R_next, t_next, R, t, chi2_keep, A_keep)

        init = (jnp.zeros((), jnp.int32), jnp.zeros((), bool), R0_, t0_,
                R0_, t0_, jnp.asarray(jnp.inf, f32), jnp.eye(6, dtype=f32))
        _, _, R, t, _, _, chi2, A_fin = jax.lax.while_loop(cond, body, init)
        return R, t, chi2, A_fin

    R, t, chi2, A_fin = run_gn(R0, t0, inp.pt_valid, inp.seg_valid, n_iter)

    # --- outlier stripping (pose_optimizer.cpp:201-242) ---
    thresh_pt = reproj_thresh / focal
    thresh_sg = thresh_pt * scale_sg0 / scale_pt0

    def strip(R, t):
        _, e_pt, _ = _pt_errors(R, t, inp)
        pt_in = inp.pt_valid & (jnp.linalg.norm(e_pt, axis=-1) <= thresh_pt)
        _, _, e_sg, _ = _seg_errors(R, t, inp)
        seg_in = inp.seg_valid & (jnp.linalg.norm(e_sg, axis=-1) <= thresh_sg)
        return pt_in, seg_in

    pt_in, seg_in = strip(R, t)
    if n_iter_ref > 0:
        R, t, chi2, A_fin = run_gn(R, t, pt_in, seg_in, n_iter_ref)
        pt_in, seg_in = strip(R, t)

    # covariance = inverse information (pose_optimizer.cpp:197-199)
    cov = jnp.linalg.inv(A_fin * focal * focal + 1e-12 * jnp.eye(6, dtype=f32))

    return PoseOptResult(
        R=R, t=t, cov=cov, pt_inlier=pt_in, seg_inlier=seg_in,
        n_obs_pt=jnp.sum(inp.pt_valid).astype(jnp.int32),
        n_obs_seg=jnp.sum(inp.seg_valid).astype(jnp.int32),
        scale_pt=scale_pt0, scale_seg=scale_sg0, chi2=chi2,
    )


def line_coeffs_from_bearings(sf: jnp.ndarray, ef: jnp.ndarray) -> jnp.ndarray:
    """Observed 2D infinite-line coefficients on the unit plane from the two
    endpoint bearings, normalized so (l0,l1) is a unit normal
    (reference: LineFeat constructor, src/feature.cpp:103-107)."""
    sp = jnp.concatenate(
        [sf[..., :2] / jnp.where(jnp.abs(sf[..., 2:3]) < 1e-10, 1e-10, sf[..., 2:3]),
         jnp.ones_like(sf[..., :1])], -1)
    ep = jnp.concatenate(
        [ef[..., :2] / jnp.where(jnp.abs(ef[..., 2:3]) < 1e-10, 1e-10, ef[..., 2:3]),
         jnp.ones_like(ef[..., :1])], -1)
    l = jnp.cross(sp, ep)
    n = jnp.linalg.norm(l[..., :2], axis=-1, keepdims=True)
    return l / jnp.maximum(n, 1e-12)
