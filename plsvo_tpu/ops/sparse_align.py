"""Sparse image alignment: batched inverse-compositional Gauss-Newton on SE(3).

THE hot loop of the pipeline (reference: src/sparse_img_align.cpp — class
SparseImgAlign; driver loop sparse_img_align.cpp:82-91, point pass
:380-502, segment pass :504-695, solve/update :697-710). The reference
iterates feature lists with per-pixel pointer walks; this rebuild evaluates
ALL point patches and ALL line-sample patches as one batched computation
per GN iteration:

- patch gathers  -> vectorized bilinear interpolation (image.extract_patches)
- Hessian        -> one (6,U*P) x (U*P,6) matmul on the MXU
- robust weights -> elementwise VPU ops
- GN iterations  -> lax.while_loop with the vikit NLLSSolver stopping rules
  (chi2-increase rollback + small-update exit)

Behavioral parity with the reference:
- inverse compositional: Jacobians + ref patch intensities cached per level
  (sparse_img_align.cpp:195-378)
- point robust weight 1/(1+|r|) per pixel (sparse_img_align.cpp:476-489;
  scale_pt stays 1 because compute_weight_scale is force-disabled at
  :130-132)
- segments: per-line mean |r| over all its samples, line weight
  1/(1+mean), line DROPPED for good when mean >= 200
  (sparse_img_align.cpp:640-680 — the reference nulls feat3D)
- point and segment systems summed into one 6x6 (sparse_img_align.cpp:162-171)
- update T <- T * exp(-x) (sparse_img_align.cpp:705-710)
- coarse-to-fine levels klt_max_level..klt_min_level (default 4..2)

Line sampling: per-level length-adaptive — each segment's ACTIVE sample
count is clip(projected_length_lvl_px / patch + 1, 2, K) inside a fixed
(M,K) array with a tail mask (the reference's setupSampling,
src/feature.cpp:160-173, incl. its per-level halving via level-px length;
no dynamic shapes, no program variants). Patch offsets are
center-symmetric rather than floor-anchored — self-consistent between ref
and cur so the optimum is identical.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from plsvo_tpu import lie
from plsvo_tpu.image import patch_offsets


class AlignPoints(NamedTuple):
    """Point-feature units for alignment (fixed capacity N)."""

    xyz_ref: jnp.ndarray  # (N, 3) 3D point in ref camera frame (= f * depth)
    uv_ref: jnp.ndarray  # (N, 2) level-0 pixel coords in ref image
    valid: jnp.ndarray  # (N,) bool


class AlignSegments(NamedTuple):
    """Line-segment sample units (fixed capacity M lines x K samples).

    With p_ref/q_ref (3D endpoints in the ref camera frame) present, the
    aligner resamples each segment PER PYRAMID LEVEL with a length-adaptive
    active count n_i = clip(len_lvl_px/patch + 1, 2, K) — the reference's
    setupSampling behavior (feature.cpp:160-173; per-level halving falls
    out of measuring the length in level px, sparse_img_align.cpp:300-310)
    — with fixed (M,K) shapes and a tail mask, so no program variants.
    Without them, the precomputed xyz_ref/uv_ref samples are used at every
    level (legacy fixed-budget path)."""

    xyz_ref: jnp.ndarray  # (M, K, 3) sampled 3D points in ref camera frame
    uv_ref: jnp.ndarray  # (M, K, 2) level-0 pixel coords of the samples
    valid: jnp.ndarray  # (M,) bool — per line
    p_ref: jnp.ndarray = None  # (M,3) start endpoint (ref camera frame)
    q_ref: jnp.ndarray = None  # (M,3) end endpoint


class AlignResult(NamedTuple):
    R: jnp.ndarray  # (3,3) refined T_cur_from_ref rotation
    t: jnp.ndarray  # (3,)
    n_tracked_pts: jnp.ndarray  # () int32 — visible point patches at finest level
    n_tracked_segs: jnp.ndarray  # () int32 — surviving visible lines
    seg_alive: jnp.ndarray  # (M,) bool — lines NOT dropped by the residual gate
    chi2: jnp.ndarray  # () final mean chi2


def jacobian_xyz2uv(xyz: jnp.ndarray) -> jnp.ndarray:
    """d(unit-plane u,v)/d(twist [v,w]) with the reference's sign convention
    (reference: include/plsvo/frame.h:138-160). xyz: (..., 3) -> (..., 2, 6)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
    zi2 = zi * zi
    o = jnp.zeros_like(x)
    row0 = jnp.stack([-zi, o, x * zi2, x * y * zi2, -(1.0 + x * x * zi2), y * zi], axis=-1)
    row1 = jnp.stack([o, -zi, y * zi2, 1.0 + y * y * zi2, -x * y * zi2, -x * zi], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _patch_and_grad(img: jnp.ndarray, centers: jnp.ndarray, patch_size: int):
    """Bilinear patch + central-difference gradient of the *interpolated*
    image at each patch pixel (matches sparse_img_align.cpp:252-258).

    Mechanism: ONE contiguous (wp x wp) slice-gather per feature
    (image.gather_patch_windows), then I/dx/dy at all patch taps are
    resampled from the window arithmetically (the taps share one
    fractional offset per feature, so image.sample_patch_windows applies).
    Interpolating an in-window central-difference map equals differencing
    the interpolant — both linear shift-invariant — so the gradients are
    exact; the previous implementation gathered a dense-packed [I,dx,dy]
    texture per tap, paying a 12x image materialization + per-tap gather
    segments.

    centers: (N, 2) level coords. Returns (I, dx, dy, valid_all) with
    I/dx/dy shaped (N, P) and valid (N,) requiring the whole bordered
    patch 1px inside the frame (halfsize+1, sparse_img_align.cpp:219)."""
    from plsvo_tpu.image import gather_patch_windows, sample_patch_windows

    H, W = img.shape
    P = patch_size
    wp = P + 6  # frac(1) + grad margin(2) each side, rounded even
    wp += wp % 2
    win, corner = gather_patch_windows(img, centers, wp)
    dxw = jnp.pad(0.5 * (win[:, :, 2:] - win[:, :, :-2]),
                  ((0, 0), (0, 0), (1, 1)))
    dyw = jnp.pad(0.5 * (win[:, 2:, :] - win[:, :-2, :]),
                  ((0, 0), (1, 1), (0, 0)))
    I, ok_w = sample_patch_windows(win, corner, centers, P)
    dx, _ = sample_patch_windows(dxw, corner, centers, P)
    dy, _ = sample_patch_windows(dyw, corner, centers, P)
    # validity parity with the old dense-map path: every tap's bilinear
    # support 1px interior (gradient maps were zeroed on the border ring)
    first = centers - (P / 2.0 - 0.5)
    au0 = jnp.floor(first[..., 0])
    av0 = jnp.floor(first[..., 1])
    valid = (ok_w & (au0 >= 1) & (av0 >= 1)
             & (au0 + P <= W - 2) & (av0 + P <= H - 2))
    return I, dx, dy, valid


def _warp_project(R, t, xyz, fx, fy, cx, cy, scale):
    """Transform ref-frame 3D points into cur frame and project to level px."""
    xyz_cur = jnp.einsum("ij,...j->...i", R, xyz) + t
    z = xyz_cur[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
    u = (fx * xyz_cur[..., 0] / zs + cx) * scale
    v = (fy * xyz_cur[..., 1] / zs + cy) * scale
    return xyz_cur, jnp.stack([u, v], axis=-1)


@partial(jax.jit, static_argnames=("patch_size", "n_iter", "levels"))
def sparse_img_align(
    pyr_ref: Sequence[jnp.ndarray],
    pyr_cur: Sequence[jnp.ndarray],
    pts: AlignPoints,
    segs: AlignSegments,
    R_init: jnp.ndarray,
    t_init: jnp.ndarray,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    *,
    levels: Tuple[int, ...] = (4, 3, 2),
    n_iter: int = 30,
    patch_size: int = 4,
) -> AlignResult:
    """Refine T_cur_from_ref over the pyramid (coarse to fine).

    pyr_*: image pyramids (lists of (h,w) f32, level 0 = full res).
    Camera must be the ideal (undistorted) pinhole the VO runs on —
    matching the reference (app/run_pipeline.cpp:788-792).
    """
    P = patch_size * patch_size
    f32 = jnp.float32
    M, K = segs.xyz_ref.shape[0], segs.xyz_ref.shape[1]
    N = pts.xyz_ref.shape[0]

    R, t = R_init.astype(f32), t_init.astype(f32)
    seg_alive = segs.valid
    n_pts_vis = jnp.zeros((), jnp.int32)
    n_seg_vis = jnp.zeros((), jnp.int32)
    chi2_out = jnp.zeros((), f32)

    # precompute twist jacobians at ref (level independent, IC)
    Jpt_frame = jacobian_xyz2uv(pts.xyz_ref)  # (N,2,6)
    adaptive = segs.p_ref is not None

    def _proj0(xyz):
        z = jnp.where(jnp.abs(xyz[..., 2]) < 1e-10, 1e-10, xyz[..., 2])
        return jnp.stack([fx * xyz[..., 0] / z + cx,
                          fy * xyz[..., 1] / z + cy], -1)

    for level in levels:
        ref_img = pyr_ref[level]
        cur_img = pyr_cur[level]
        scale = f32(1.0 / (1 << level))
        focal_scale = (fx * scale).astype(f32)  # errorMultiplier2/2^L analogue

        # ---- per-level segment sampling (length-adaptive when endpoints
        # are present — setupSampling analogue, see AlignSegments) ----
        if adaptive:
            sp_lvl = _proj0(segs.p_ref) * scale
            ep_lvl = _proj0(segs.q_ref) * scale
            length = jnp.linalg.norm(ep_lvl - sp_lvl, axis=-1)  # level px
            n_act = jnp.clip((length / patch_size).astype(jnp.int32) + 1,
                             2, K)  # (M,)
            jidx = jnp.arange(K, dtype=f32)
            denom = jnp.maximum(n_act - 1, 1).astype(f32)
            alpha = jnp.minimum(jidx[None, :] / denom[:, None], 1.0)  # (M,K)
            dpq = (segs.q_ref - segs.p_ref)[:, None, :]
            xyz_sg = segs.p_ref[:, None, :] + alpha[..., None] * dpq
            uv_sg = _proj0(xyz_sg)  # level-0 px
            smask = jidx[None, :] < n_act.astype(f32)[:, None]  # (M,K)
        else:
            xyz_sg = segs.xyz_ref
            uv_sg = segs.uv_ref
            smask = jnp.ones((M, K), bool)
            n_act = jnp.full((M,), K, jnp.int32)
        Jseg_frame = jacobian_xyz2uv(xyz_sg)  # (M,K,2,6)
        # points + all line samples share the gather batch: ONE warp/project
        # and ONE patch gather per GN iteration instead of two of each (the
        # fixed per-kernel costs dominate at these sizes)
        xyz_all = jnp.concatenate([pts.xyz_ref, xyz_sg.reshape(M * K, 3)])
        uv_all_ref = jnp.concatenate([pts.uv_ref, uv_sg.reshape(M * K, 2)])

        # ---- per-level inverse-compositional precompute (one fused
        # patch+gradient gather for points and line samples) ----
        I_ref_all, dx_all, dy_all, vis_all = _patch_and_grad(
            ref_img, uv_all_ref * scale, patch_size)
        I_ref_pt, dx_pt, dy_pt = (a[:N] for a in (I_ref_all, dx_all, dy_all))
        vis_pt = vis_all[:N] & pts.valid
        # J = (dx*J0 + dy*J1) * focal*scale  (sparse_img_align.cpp:260-263)
        Jpt = (
            dx_pt[..., None] * Jpt_frame[:, None, 0, :]
            + dy_pt[..., None] * Jpt_frame[:, None, 1, :]
        ) * focal_scale  # (N,P,6)

        I_ref_sg = I_ref_all[N:].reshape(M, K, P)
        dx_sg = dx_all[N:].reshape(M, K, P)
        dy_sg = dy_all[N:].reshape(M, K, P)
        # reference requires both ENDPOINT patches in frame (line-level check,
        # sparse_img_align.cpp:299-301); we require all ACTIVE samples'.
        vis_sg = jnp.all(vis_all[N:].reshape(M, K) | ~smask,
                         axis=-1) & seg_alive  # (M,)
        Jsg = (
            dx_sg[..., None] * Jseg_frame[:, :, None, 0, :]
            + dy_sg[..., None] * Jseg_frame[:, :, None, 1, :]
        ) * focal_scale * smask[..., None, None]  # (M,K,P,6); tail zeroed

        # ---- per-level window prefetch: ONE gather at the level-start
        # projections; every GN iteration resamples gather-free from the
        # windows (margin 3 level-px of pose-induced drift — beyond it a
        # unit is masked out for that iteration, like leaving the image) ----
        from plsvo_tpu.image import (gather_patch_windows,
                                     sample_patch_windows)

        wp_win = patch_size + 1 + 2 * 3
        wp_win += wp_win % 2
        _, uv0_all = _warp_project(R, t, xyz_all, fx, fy, cx, cy, scale)
        win_all, corner_all = gather_patch_windows(cur_img, uv0_all, wp_win)
        wh_lvl = (jnp.full(uv0_all.shape[0], cur_img.shape[1], f32),
                  jnp.full(uv0_all.shape[0], cur_img.shape[0], f32))

        def cond(carry):
            it, stop, *_ = carry
            return (it < n_iter) & jnp.logical_not(stop)

        def body(carry):
            it, stop, R, t, R_prev, t_prev, chi2_prev, alive = carry

            # ---- one warp + window resample for points and line samples ----
            _, uv_cur_all = _warp_project(R, t, xyz_all, fx, fy, cx, cy, scale)
            I_cur_all, in_all = sample_patch_windows(
                win_all, corner_all, uv_cur_all, patch_size, wh=wh_lvl)

            # ---- points ----
            I_cur_pt, in_pt = I_cur_all[:N], in_all[:N]
            ok_pt = (vis_pt & in_pt)[:, None]  # (N,1) -> broadcast over P
            r_pt = I_cur_pt - I_ref_pt  # (N,P)
            w_pt = 1.0 / (1.0 + jnp.abs(r_pt))
            wm_pt = jnp.where(ok_pt, w_pt, 0.0)
            Jf_pt = Jpt.reshape(N * P, 6)
            wr_pt = (wm_pt * r_pt).reshape(N * P)
            H_pt = Jf_pt.T @ (Jf_pt * wm_pt.reshape(N * P, 1))
            b_pt = -(Jf_pt.T @ wr_pt)
            chi2_pt = jnp.sum(wm_pt * r_pt * r_pt)

            # ---- segments ----
            I_cur_sg = I_cur_all[N:].reshape(M, K, P)
            in_sg = in_all[N:].reshape(M, K)
            ok_line = vis_sg & jnp.all(in_sg | ~smask, axis=-1) & alive  # (M,)
            r_sg = I_cur_sg - I_ref_sg  # (M,K,P)
            mean_abs = (jnp.sum(jnp.abs(r_sg) * smask[..., None], axis=(1, 2))
                        / jnp.maximum(n_act.astype(f32) * P, 1.0))  # (M,)
            # permanent drop gate (reference: res_ >= 200 -> feat3D = NULL)
            alive_new = alive & jnp.where(ok_line, mean_abs < 200.0, True)
            use_line = ok_line & (mean_abs < 200.0)
            w_line = jnp.where(use_line, 1.0 / (1.0 + mean_abs), 0.0)  # (M,)
            Jf_sg = Jsg.reshape(M, K * P, 6)
            r_sgf = r_sg.reshape(M, K * P)
            # per-line unweighted inner sums, then line weight
            H_sg = jnp.einsum("mpi,mpj,m->ij", Jf_sg, Jf_sg, w_line)
            b_sg = -jnp.einsum("mpi,mp,m->i", Jf_sg, r_sgf, w_line)
            chi2_sg = jnp.sum(w_line * mean_abs * mean_abs)

            H = H_pt + H_sg
            b = b_pt + b_sg
            n_meas = (jnp.sum(ok_pt) * P
                      + jnp.sum(jnp.where(use_line, n_act, 0)) * P)
            chi2 = (chi2_pt + chi2_sg) / jnp.maximum(n_meas.astype(f32), 1.0)

            from plsvo_tpu.batlin import solve_psd
            x = solve_psd(H, b, 1e-8)
            bad = jnp.any(jnp.isnan(x))

            # vikit GaussNewton rollback: chi2 at current model worse than at
            # previous model -> revert and stop
            worse = (it > 0) & (chi2 > chi2_prev)
            stop_new = worse | bad | (jnp.max(jnp.abs(x)) < 1e-8)

            dR, dt = lie.se3_exp(-x)
            R_new, t_new = lie.compose(R, t, dR, dt)
            R_out = jnp.where(worse, R_prev, jnp.where(bad, R, R_new))
            t_out = jnp.where(worse, t_prev, jnp.where(bad, t, t_new))
            chi2_keep = jnp.where(worse, chi2_prev, chi2)
            return (it + 1, stop_new, R_out, t_out, R, t, chi2_keep, alive_new)

        init = (
            jnp.zeros((), jnp.int32), jnp.zeros((), bool), R, t, R, t,
            jnp.asarray(jnp.inf, f32), seg_alive,
        )
        it, _, R, t, _, _, chi2_out, seg_alive = jax.lax.while_loop(cond, body, init)

        # visibility bookkeeping at the finest processed level
        n_pts_vis = jnp.sum(vis_pt).astype(jnp.int32)
        n_seg_vis = jnp.sum(vis_sg & seg_alive).astype(jnp.int32)

    return AlignResult(
        R=R, t=t, n_tracked_pts=n_pts_vis, n_tracked_segs=n_seg_vis,
        seg_alive=seg_alive, chi2=chi2_out,
    )


def make_align_points(uv, bearings, depths, valid) -> AlignPoints:
    """Build point units: xyz_ref = bearing * depth
    (reference: sparse_img_align.cpp:230-232 uses the distance-normalized
    bearing, NOT z-depth)."""
    xyz = bearings * depths[..., None]
    return AlignPoints(xyz_ref=xyz, uv_ref=uv, valid=valid)


def make_align_segments(sp_uv, ep_uv, s_bearing, e_bearing, s_depth, e_depth,
                        valid, n_samples: int, fx, fy, cx, cy) -> AlignSegments:
    """Build fixed-count line samples along each segment.

    The reference steps 2D pixels and 3D points with *independent* linear
    increments (sparse_img_align.cpp:318-333), which are inconsistent under
    perspective (the projection of the 3D midpoint is not the 2D midpoint).
    We instead sample the 3D segment linearly and take uv_ref as the exact
    projection of each 3D sample — the photometric model is then consistent
    at every sample, not just the endpoints. Fixed sample budget per
    SURVEY §7.2 (vs dynamic setupSampling, src/feature.cpp:160-173)."""
    p_ref = s_bearing * s_depth[..., None]  # (M,3)
    q_ref = e_bearing * e_depth[..., None]
    alpha = jnp.linspace(0.0, 1.0, n_samples, dtype=sp_uv.dtype)  # (K,)
    xyz = p_ref[:, None, :] + alpha[None, :, None] * (q_ref - p_ref)[:, None, :]
    z = jnp.where(jnp.abs(xyz[..., 2]) < 1e-10, 1e-10, xyz[..., 2])
    uv = jnp.stack(
        [fx * xyz[..., 0] / z + cx, fy * xyz[..., 1] / z + cy], axis=-1)
    # endpoints enable the aligner's per-level length-adaptive resampling
    return AlignSegments(xyz_ref=xyz, uv_ref=uv, valid=valid,
                         p_ref=p_ref, q_ref=q_ref)
