"""Reprojector: map -> frame candidate selection + batched refinement.

TPU-native rebuild of the reference Reprojector (src/reprojector.cpp):
project landmarks into the new frame, deduplicate per grid cell keeping the
best-quality candidate (GOOD > UNKNOWN > CANDIDATE, reprojector.cpp:219-234),
refine all selected candidates with one batched find_match_direct
(vs the reference's per-cell Matcher::findMatchDirect loop,
reprojector.cpp:236-276), and report per-landmark success/failure for the
quality counters (reprojector.cpp:292-308).

Divergence (by design): the reference gathers candidates from the features
of the 10 closest keyframes + the candidate lists; with fixed landmark
tables it is simpler and cheaper to project ALL active landmarks — the
per-cell dedup yields the same per-frame working set.

Structure: `_select_points`/`_select_segments` do projection + per-cell
dedup + anchor selection and emit `RefineInputs`; the refinement
(`matcher.find_match_direct_atlas`) runs either per class
(reproject_points/reproject_segments) or, in the pipeline hot path, ONCE
over the concatenation of points + both segment endpoints
(reproject_combined) — one warp/align2d kernel chain instead of three.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from plsvo_tpu.image import ensure_flat_atlas, pack_pyramid_atlas
from plsvo_tpu.ops import matcher as matcher_ops
from plsvo_tpu.ops.detection import grid_cells


def masked_compact(mask: jnp.ndarray, max_out: int):
    """Stable-compact indices of True entries to the front.
    Returns (src_idx (max_out,), valid (max_out,)).

    Invalid rows scatter to index n with mode="drop" (an earlier variant
    used an n+1-long buffer whose dump slot leaked a spurious valid row
    into position n whenever n < max_out); output is always exactly
    max_out wide, padded invalid when fewer rows exist."""
    n = mask.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, rank, n)
    inv = jnp.full((n,), n, jnp.int32)
    inv = inv.at[dest].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    if n >= max_out:
        src = inv[:max_out]
    else:
        src = jnp.concatenate(
            [inv, jnp.full((max_out - n,), n, jnp.int32)])
    ok = src < n
    return jnp.where(ok, src, 0), ok


class RefineInputs(NamedTuple):
    """Per-candidate inputs to find_match_direct (one row per candidate)."""

    kf_idx: jnp.ndarray  # (M,) anchor keyframe slot (clamped >= 0)
    uv_ref: jnp.ndarray  # (M,2) anchor feature px (level-0)
    f_ref: jnp.ndarray  # (M,3) anchor bearing
    depth_ref: jnp.ndarray  # (M,) range along the anchor bearing
    level_ref: jnp.ndarray  # (M,)
    R_ca: jnp.ndarray  # (M,3,3) T_cur_anchor
    t_ca: jnp.ndarray  # (M,3)
    uv_init: jnp.ndarray  # (M,2) projected level-0 position in cur
    valid: jnp.ndarray  # (M,)
    ftype: jnp.ndarray  # (M,) 0=corner, 1=edgelet (anchor feature class)
    grad_dir: jnp.ndarray  # (M,2) edgelet dominant gradient dir (anchor px)


class ReprojResult(NamedTuple):
    lm_idx: jnp.ndarray  # (M,) landmark rows selected (garbage where ~sel)
    selected: jnp.ndarray  # (M,) a candidate was attempted
    uv: jnp.ndarray  # (M,2) refined level-0 px
    level: jnp.ndarray  # (M,) search level used
    matched: jnp.ndarray  # (M,) refinement succeeded
    n_attempts: jnp.ndarray  # () int32
    n_matches: jnp.ndarray  # ()


class ReprojSegResult(NamedTuple):
    lm_idx: jnp.ndarray  # (M,)
    selected: jnp.ndarray
    s_uv: jnp.ndarray  # (M,2)
    e_uv: jnp.ndarray
    level: jnp.ndarray
    matched: jnp.ndarray  # both endpoints refined
    n_attempts: jnp.ndarray
    n_matches: jnp.ndarray


def _rel_pose_to_anchor(kf_R, kf_t, akf_c, R_cur, t_cur):
    """T_cur_anchor = T_cur_w * (T_anchor_w)^-1 per candidate."""
    R_a = kf_R[akf_c]
    t_a = kf_t[akf_c]
    R_ca = jnp.einsum("ij,mkj->mik", R_cur, R_a)  # R_cur @ R_a^T
    t_ca = t_cur[None] - jnp.einsum("mij,mj->mi", R_ca, t_a)
    anchor_center = -jnp.einsum("mji,mj->mi", R_a, t_a)
    return R_ca, t_ca, anchor_center


class RetryInfo(NamedTuple):
    """Per-cell runner-up bookkeeping for the second refinement round
    (reference: refineBestCandidate retries the next-best candidate in a
    cell after a failed refinement, reprojector.cpp:236-276)."""

    cell_of_row: jnp.ndarray  # (M,) cell id of each first-round row
    second_row: jnp.ndarray  # (n_cells,) runner-up landmark row, -1 = none


def _point_anchor_inputs(lm, valid, uv_init, pt_pos,
                         pt_obs_kf, pt_obs_uv, pt_obs_f, pt_obs_level,
                         pt_anchor_kf, pt_anchor_uv, pt_anchor_f,
                         pt_anchor_level, kf_R, kf_t, R_cur, t_cur,
                         pt_anchor_type=None, pt_anchor_dir=None):
    """Warp-anchor selection for a set of point-landmark rows: min-view-
    angle observation as the anchor (reference: Feature3D::getCloseViewObs,
    feature3D.cpp:80-125 — pick the stored observation whose viewing
    direction is closest to the current one; falls back to the creation
    anchor when no obs slot wins)."""
    obs_kf_l = pt_obs_kf[lm]  # (M,O)
    obs_ok = obs_kf_l >= 0
    okf_c = jnp.maximum(obs_kf_l, 0)
    obs_center = -jnp.einsum("moji,moj->moi", kf_R[okf_c], kf_t[okf_c])  # (M,O,3)
    cur_center = -jnp.einsum("ji,j->i", R_cur, t_cur)
    dir_cur = pt_pos[lm] - cur_center[None]
    dir_cur = dir_cur / jnp.maximum(
        jnp.linalg.norm(dir_cur, axis=-1, keepdims=True), 1e-9)
    dir_obs = pt_pos[lm][:, None, :] - obs_center
    dir_obs = dir_obs / jnp.maximum(
        jnp.linalg.norm(dir_obs, axis=-1, keepdims=True), 1e-9)
    cosang = jnp.sum(dir_obs * dir_cur[:, None, :], axis=-1)
    cosang = jnp.where(obs_ok, cosang, -2.0)
    best_o = jnp.argmax(cosang, axis=-1)  # (M,)
    has_obs = jnp.take_along_axis(obs_ok, best_o[:, None], 1)[:, 0]
    mi = jnp.arange(lm.shape[0])
    sel_kf = obs_kf_l[mi, best_o]
    sel_uv = pt_obs_uv[lm][mi, best_o]
    sel_f = pt_obs_f[lm][mi, best_o]
    sel_level = pt_obs_level[lm][mi, best_o]
    akf = jnp.where(has_obs, sel_kf, pt_anchor_kf[lm])
    a_uv = jnp.where(has_obs[:, None], sel_uv, pt_anchor_uv[lm])
    a_f = jnp.where(has_obs[:, None], sel_f, pt_anchor_f[lm])
    a_level = jnp.where(has_obs, sel_level, pt_anchor_level[lm])

    akf_c = jnp.maximum(akf, 0)
    R_ca, t_ca, anchor_center = _rel_pose_to_anchor(
        kf_R, kf_t, akf_c, R_cur, t_cur)
    depth_ref = jnp.linalg.norm(pt_pos[lm] - anchor_center, axis=-1)
    M = lm.shape[0]
    # EDGELET routing: type/dir are per-landmark from the CREATION anchor;
    # when the min-angle obs anchor differs, the creation direction is an
    # approximation (off by the in-plane rotation between the two views) —
    # the affine warp in the matcher absorbs the rest
    ft = (pt_anchor_type[lm] if pt_anchor_type is not None
          else jnp.zeros(M, jnp.int32))
    gd = (pt_anchor_dir[lm] if pt_anchor_dir is not None
          else jnp.zeros((M, 2), jnp.float32))
    return RefineInputs(
        kf_idx=akf_c, uv_ref=a_uv, f_ref=a_f, depth_ref=depth_ref,
        level_ref=a_level, R_ca=R_ca, t_ca=t_ca, uv_init=uv_init,
        valid=valid & (akf >= 0), ftype=ft, grad_dir=gd)


def _runner_up_by_cell(key, is_winner, active, cell, n_cells, n_rows):
    """Deterministic per-cell runner-up row: mask the winners out and take
    the per-cell max again. Returns (n_cells,) landmark row, -1 = none."""
    key2 = jnp.where(is_winner, 0, key)
    cell_best2 = jax.ops.segment_max(key2, cell, num_segments=n_cells)
    is_second = active & ~is_winner & (key2 == cell_best2[cell]) & (key2 > 0)
    rowval = jnp.where(is_second, n_rows - jnp.arange(n_rows), 0)
    second_val = jax.ops.segment_max(rowval, cell, num_segments=n_cells)
    return jnp.where(second_val > 0, n_rows - second_val, -1)


def _project_uv(pos, R_cur, t_cur, fx, fy, cx, cy):
    xyz = jnp.einsum("ij,pj->pi", R_cur, pos) + t_cur
    ok = xyz[:, 2] > 1e-3
    zs = jnp.where(ok, xyz[:, 2], 1.0)
    return jnp.stack([fx * xyz[:, 0] / zs + cx,
                      fy * xyz[:, 1] / zs + cy], -1), ok


def _select_points(
    pt_pos, pt_status, pt_anchor_kf, pt_anchor_uv, pt_anchor_f,
    pt_anchor_level, pt_obs_kf, pt_obs_uv, pt_obs_f, pt_obs_level,
    kf_R, kf_t, img_shape, R_cur, t_cur, fx, fy, cx, cy,
    *, cell_size, max_out, patch_size,
    pt_anchor_type=None, pt_anchor_dir=None,
):
    """Project all point landmarks, per-cell best-quality dedup, min-view-
    angle anchor selection. Returns (lm, sel, RefineInputs, RetryInfo)."""
    P = pt_pos.shape[0]
    H, W = img_shape
    nx, ny, n_cells = grid_cells(W, H, cell_size)

    # ---- project all active landmarks ----
    uv, z_ok = _project_uv(pt_pos, R_cur, t_cur, fx, fy, cx, cy)
    margin = patch_size
    in_img = ((uv[:, 0] > margin) & (uv[:, 0] < W - margin)
              & (uv[:, 1] > margin) & (uv[:, 1] < H - margin))
    active = (pt_status > 0) & z_ok & in_img

    # ---- per-cell best-quality winner ----
    cell = (jnp.clip((uv[:, 1] / cell_size).astype(jnp.int32), 0, ny - 1) * nx
            + jnp.clip((uv[:, 0] / cell_size).astype(jnp.int32), 0, nx - 1))
    # key: status first, then lower row idx wins (deterministic)
    key = jnp.where(active, pt_status.astype(jnp.int32) * (P + 1) + (P - jnp.arange(P)), 0)
    cell_best = jax.ops.segment_max(key, cell, num_segments=n_cells)
    is_winner = active & (key == cell_best[cell]) & (key > 0)

    src, sel = masked_compact(is_winner, max_out)
    lm = src  # landmark rows

    ri = _point_anchor_inputs(
        lm, sel, uv[lm], pt_pos, pt_obs_kf, pt_obs_uv, pt_obs_f,
        pt_obs_level, pt_anchor_kf, pt_anchor_uv, pt_anchor_f,
        pt_anchor_level, kf_R, kf_t, R_cur, t_cur,
        pt_anchor_type, pt_anchor_dir)
    retry = RetryInfo(
        cell_of_row=cell[lm],
        second_row=_runner_up_by_cell(key, is_winner, active, cell,
                                      n_cells, P))
    return lm, sel, ri, retry


def _select_segments(
    ln_spos, ln_epos, ln_status,
    ln_anchor_kf, ln_anchor_suv, ln_anchor_euv, ln_anchor_sf, ln_anchor_ef,
    ln_anchor_level, kf_R, kf_t, img_shape, R_cur, t_cur, fx, fy, cx, cy,
    *, cell_size, max_out, patch_size,
):
    """Line landmarks: per-cell dedup on the midpoint cell; emits refine
    inputs for BOTH endpoints (reference: findMatchDirect(LineSeg),
    matcher.cpp:232-275; grid insertion at both endpoint cells,
    reprojector.cpp:405-423). Returns (lm, sel, ri_start, ri_end, retry)."""
    L = ln_spos.shape[0]
    H, W = img_shape
    nx, ny, n_cells = grid_cells(W, H, cell_size)

    suv, s_ok = _project_uv(ln_spos, R_cur, t_cur, fx, fy, cx, cy)
    euv, e_ok = _project_uv(ln_epos, R_cur, t_cur, fx, fy, cx, cy)
    margin = patch_size

    def in_img(uv):
        return ((uv[:, 0] > margin) & (uv[:, 0] < W - margin)
                & (uv[:, 1] > margin) & (uv[:, 1] < H - margin))

    active = (ln_status > 0) & s_ok & e_ok & in_img(suv) & in_img(euv)
    mid = 0.5 * (suv + euv)
    cell = (jnp.clip((mid[:, 1] / cell_size).astype(jnp.int32), 0, ny - 1) * nx
            + jnp.clip((mid[:, 0] / cell_size).astype(jnp.int32), 0, nx - 1))
    key = jnp.where(active, ln_status.astype(jnp.int32) * (L + 1) + (L - jnp.arange(L)), 0)
    cell_best = jax.ops.segment_max(key, cell, num_segments=n_cells)
    is_winner = active & (key == cell_best[cell]) & (key > 0)
    src, sel = masked_compact(is_winner, max_out)
    lm = src

    ri_s, ri_e = _segment_anchor_inputs(
        lm, sel, suv[lm], euv[lm], ln_spos, ln_epos, ln_anchor_kf,
        ln_anchor_suv, ln_anchor_euv, ln_anchor_sf, ln_anchor_ef,
        ln_anchor_level, kf_R, kf_t, R_cur, t_cur)
    retry = RetryInfo(
        cell_of_row=cell[lm],
        second_row=_runner_up_by_cell(key, is_winner, active, cell,
                                      n_cells, L))
    return lm, sel, ri_s, ri_e, retry


def _segment_anchor_inputs(lm, valid, suv_init, euv_init, ln_spos, ln_epos,
                           ln_anchor_kf, ln_anchor_suv, ln_anchor_euv,
                           ln_anchor_sf, ln_anchor_ef, ln_anchor_level,
                           kf_R, kf_t, R_cur, t_cur):
    """Refine inputs for both endpoints of a set of line-landmark rows."""
    akf = ln_anchor_kf[lm]
    akf_c = jnp.maximum(akf, 0)
    R_ca, t_ca, anchor_center = _rel_pose_to_anchor(
        kf_R, kf_t, akf_c, R_cur, t_cur)
    s_depth = jnp.linalg.norm(ln_spos[lm] - anchor_center, axis=-1)
    e_depth = jnp.linalg.norm(ln_epos[lm] - anchor_center, axis=-1)
    valid0 = valid & (akf >= 0)
    lvl = ln_anchor_level[lm]
    M = lm.shape[0]
    zt = jnp.zeros(M, jnp.int32)
    zd = jnp.zeros((M, 2), jnp.float32)
    ri_s = RefineInputs(
        kf_idx=akf_c, uv_ref=ln_anchor_suv[lm], f_ref=ln_anchor_sf[lm],
        depth_ref=s_depth, level_ref=lvl, R_ca=R_ca, t_ca=t_ca,
        uv_init=suv_init, valid=valid0, ftype=zt, grad_dir=zd)
    ri_e = RefineInputs(
        kf_idx=akf_c, uv_ref=ln_anchor_euv[lm], f_ref=ln_anchor_ef[lm],
        depth_ref=e_depth, level_ref=lvl, R_ca=R_ca, t_ca=t_ca,
        uv_init=euv_init, valid=valid0, ftype=zt, grad_dir=zd)
    return ri_s, ri_e


def _retry_rows(retry: RetryInfo, failed: jnp.ndarray, max_retry: int):
    """Pick up to max_retry runner-up landmark rows for cells whose first
    candidate failed refinement. Returns (lm2, valid2)."""
    lm2_cand = retry.second_row[retry.cell_of_row]  # (M,)
    want = failed & (lm2_cand >= 0)
    src2, ok2 = masked_compact(want, max_retry)
    return jnp.maximum(lm2_cand[src2], 0), ok2


def _refine(kf_pyr_stack, cur_pyr, ri: RefineInputs, fx, fy, cx, cy,
            *, patch_size, has_edgelets=False):
    kf_flat = ensure_flat_atlas(kf_pyr_stack)
    cur_atlas, cx_, cs = pack_pyramid_atlas(cur_pyr)
    return matcher_ops.find_match_direct_atlas(
        kf_flat, cur_atlas, cx_, cs,
        ri.kf_idx, ri.uv_ref, ri.f_ref, ri.depth_ref, ri.level_ref,
        ri.R_ca, ri.t_ca, ri.uv_init, ri.valid,
        fx, fy, cx, cy, ri.ftype, ri.grad_dir,
        patch_size=patch_size, max_level=len(cur_pyr) - 1,
        has_edgelets=has_edgelets)


@partial(jax.jit, static_argnames=("cell_size", "max_out", "patch_size",
                                   "has_edgelets", "retry"))
def reproject_points(
    pt_pos: jnp.ndarray,  # (P,3)
    pt_status: jnp.ndarray,  # (P,) int8
    pt_anchor_kf: jnp.ndarray,  # (P,)
    pt_anchor_uv: jnp.ndarray,  # (P,2)
    pt_anchor_f: jnp.ndarray,  # (P,3)
    pt_anchor_level: jnp.ndarray,  # (P,)
    pt_obs_kf: jnp.ndarray,  # (P,O) observation slots (for min-angle anchor)
    pt_obs_uv: jnp.ndarray,  # (P,O,2)
    pt_obs_f: jnp.ndarray,  # (P,O,3)
    pt_obs_level: jnp.ndarray,  # (P,O)
    kf_R: jnp.ndarray,  # (K,3,3) T_f_w
    kf_t: jnp.ndarray,  # (K,3)
    kf_pyr_stack: Sequence[jnp.ndarray],
    cur_pyr: Sequence[jnp.ndarray],
    R_cur: jnp.ndarray, t_cur: jnp.ndarray,  # T_f_w of current frame (prior)
    fx, fy, cx, cy,
    *,
    cell_size: int = 25,
    max_out: int = 192,
    patch_size: int = 8,
    has_edgelets: bool = False,
    pt_anchor_type=None,
    pt_anchor_dir=None,
    retry: bool = True,
) -> ReprojResult:
    lm, sel, ri, rinfo = _select_points(
        pt_pos, pt_status, pt_anchor_kf, pt_anchor_uv, pt_anchor_f,
        pt_anchor_level, pt_obs_kf, pt_obs_uv, pt_obs_f, pt_obs_level,
        kf_R, kf_t, cur_pyr[0].shape, R_cur, t_cur, fx, fy, cx, cy,
        cell_size=cell_size, max_out=max_out, patch_size=patch_size,
        pt_anchor_type=pt_anchor_type, pt_anchor_dir=pt_anchor_dir)
    res = _refine(kf_pyr_stack, cur_pyr, ri, fx, fy, cx, cy,
                  patch_size=patch_size, has_edgelets=has_edgelets)
    if retry:
        # second round over cells whose winner failed: runner-up candidate
        # (reference: reprojector.cpp:236-276), appended as EXTRA result
        # rows so the first candidate's failure still reaches the quality
        # counters. Fixed width max_out//8 — one program variant.
        Mr = max(max_out // 8, 8)
        lm2, sel2 = _retry_rows(rinfo, sel & ~res.ok, Mr)
        uv2, _ = _project_uv(pt_pos[lm2], R_cur, t_cur, fx, fy, cx, cy)
        ri2 = _point_anchor_inputs(
            lm2, sel2, uv2, pt_pos, pt_obs_kf, pt_obs_uv, pt_obs_f,
            pt_obs_level, pt_anchor_kf, pt_anchor_uv, pt_anchor_f,
            pt_anchor_level, kf_R, kf_t, R_cur, t_cur,
            pt_anchor_type, pt_anchor_dir)
        res2 = _refine(kf_pyr_stack, cur_pyr, ri2, fx, fy, cx, cy,
                       patch_size=patch_size, has_edgelets=has_edgelets)
        lm = jnp.concatenate([lm, lm2])
        sel = jnp.concatenate([sel, sel2])
        res = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), res, res2)
    return ReprojResult(
        lm_idx=lm, selected=sel, uv=res.uv, level=res.level,
        matched=res.ok & sel,
        n_attempts=jnp.sum(sel).astype(jnp.int32),
        n_matches=jnp.sum(res.ok & sel).astype(jnp.int32))


@partial(jax.jit, static_argnames=("cell_size", "max_out", "patch_size",
                                   "retry"))
def reproject_segments(
    ln_spos, ln_epos, ln_status,
    ln_anchor_kf, ln_anchor_suv, ln_anchor_euv, ln_anchor_sf, ln_anchor_ef,
    ln_anchor_level,
    kf_R, kf_t, kf_pyr_stack, cur_pyr,
    R_cur, t_cur, fx, fy, cx, cy,
    *,
    cell_size: int = 25,
    max_out: int = 96,
    patch_size: int = 8,
    retry: bool = True,
) -> ReprojSegResult:
    lm, sel, ri_s, ri_e, rinfo = _select_segments(
        ln_spos, ln_epos, ln_status, ln_anchor_kf, ln_anchor_suv,
        ln_anchor_euv, ln_anchor_sf, ln_anchor_ef, ln_anchor_level,
        kf_R, kf_t, cur_pyr[0].shape, R_cur, t_cur, fx, fy, cx, cy,
        cell_size=cell_size, max_out=max_out, patch_size=patch_size)
    res_s = _refine(kf_pyr_stack, cur_pyr, ri_s, fx, fy, cx, cy,
                    patch_size=patch_size)
    res_e = _refine(kf_pyr_stack, cur_pyr, ri_e, fx, fy, cx, cy,
                    patch_size=patch_size)
    if retry:
        Gr = max(max_out // 8, 8)
        failed = sel & ~(res_s.ok & res_e.ok)
        lm2, sel2 = _retry_rows(rinfo, failed, Gr)
        suv2, _ = _project_uv(ln_spos[lm2], R_cur, t_cur, fx, fy, cx, cy)
        euv2, _ = _project_uv(ln_epos[lm2], R_cur, t_cur, fx, fy, cx, cy)
        ri_s2, ri_e2 = _segment_anchor_inputs(
            lm2, sel2, suv2, euv2, ln_spos, ln_epos, ln_anchor_kf,
            ln_anchor_suv, ln_anchor_euv, ln_anchor_sf, ln_anchor_ef,
            ln_anchor_level, kf_R, kf_t, R_cur, t_cur)
        res_s2 = _refine(kf_pyr_stack, cur_pyr, ri_s2, fx, fy, cx, cy,
                         patch_size=patch_size)
        res_e2 = _refine(kf_pyr_stack, cur_pyr, ri_e2, fx, fy, cx, cy,
                         patch_size=patch_size)
        lm = jnp.concatenate([lm, lm2])
        sel = jnp.concatenate([sel, sel2])
        res_s = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                             res_s, res_s2)
        res_e = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                             res_e, res_e2)
    both = res_s.ok & res_e.ok & sel
    return ReprojSegResult(
        lm_idx=lm, selected=sel, s_uv=res_s.uv, e_uv=res_e.uv,
        level=jnp.maximum(res_s.level, res_e.level), matched=both,
        n_attempts=jnp.sum(sel).astype(jnp.int32),
        n_matches=jnp.sum(both).astype(jnp.int32))


@partial(jax.jit, static_argnames=(
    "cell_size", "cell_size_segs", "max_pts_out", "max_segs_out",
    "patch_size", "has_edgelets", "retry"))
def reproject_combined(
    pt_pos, pt_status, pt_anchor_kf, pt_anchor_uv, pt_anchor_f,
    pt_anchor_level, pt_obs_kf, pt_obs_uv, pt_obs_f, pt_obs_level,
    ln_spos, ln_epos, ln_status,
    ln_anchor_kf, ln_anchor_suv, ln_anchor_euv, ln_anchor_sf, ln_anchor_ef,
    ln_anchor_level,
    kf_R, kf_t, kf_pyr_stack, cur_pyr,
    R_cur, t_cur, fx, fy, cx, cy,
    *,
    cell_size: int = 25,
    cell_size_segs: int = 25,
    max_pts_out: int = 192,
    max_segs_out: int = 96,
    patch_size: int = 8,
    has_edgelets: bool = False,
    pt_anchor_type=None,
    pt_anchor_dir=None,
    retry: bool = True,
):
    """Points + both segment endpoints refined in ONE find_match_direct
    batch (the pipeline hot path): three warp/align2d kernel chains fold
    into one over M = max_pts_out + 2*max_segs_out rows. With retry, ONE
    additional quarter-width batch refines per-cell runner-ups wherever the
    first candidate failed (reference: reprojector.cpp:236-276), appended
    as extra result rows (the failed first attempts keep feeding the
    quality counters)."""
    img_shape = cur_pyr[0].shape
    lm_p, sel_p, ri_p, rinfo_p = _select_points(
        pt_pos, pt_status, pt_anchor_kf, pt_anchor_uv, pt_anchor_f,
        pt_anchor_level, pt_obs_kf, pt_obs_uv, pt_obs_f, pt_obs_level,
        kf_R, kf_t, img_shape, R_cur, t_cur, fx, fy, cx, cy,
        cell_size=cell_size, max_out=max_pts_out, patch_size=patch_size,
        pt_anchor_type=pt_anchor_type, pt_anchor_dir=pt_anchor_dir)
    lm_s, sel_s, ri_s, ri_e, rinfo_s = _select_segments(
        ln_spos, ln_epos, ln_status, ln_anchor_kf, ln_anchor_suv,
        ln_anchor_euv, ln_anchor_sf, ln_anchor_ef, ln_anchor_level,
        kf_R, kf_t, img_shape, R_cur, t_cur, fx, fy, cx, cy,
        cell_size=cell_size_segs, max_out=max_segs_out,
        patch_size=patch_size)

    ri = jax.tree.map(lambda *xs: jnp.concatenate(xs), ri_p, ri_s, ri_e)
    res = _refine(kf_pyr_stack, cur_pyr, ri, fx, fy, cx, cy,
                  patch_size=patch_size, has_edgelets=has_edgelets)
    M, G = max_pts_out, max_segs_out
    r_p = jax.tree.map(lambda a: a[:M], res)
    r_s = jax.tree.map(lambda a: a[M:M + G], res)
    r_e = jax.tree.map(lambda a: a[M + G:], res)

    if retry:
        Mr = max(max_pts_out // 8, 8)
        Gr = max(max_segs_out // 8, 8)
        lm_p2, sel_p2 = _retry_rows(rinfo_p, sel_p & ~r_p.ok, Mr)
        uv_p2, _ = _project_uv(pt_pos[lm_p2], R_cur, t_cur, fx, fy, cx, cy)
        ri_p2 = _point_anchor_inputs(
            lm_p2, sel_p2, uv_p2, pt_pos, pt_obs_kf, pt_obs_uv, pt_obs_f,
            pt_obs_level, pt_anchor_kf, pt_anchor_uv, pt_anchor_f,
            pt_anchor_level, kf_R, kf_t, R_cur, t_cur,
            pt_anchor_type, pt_anchor_dir)
        lm_s2, sel_s2 = _retry_rows(rinfo_s, sel_s & ~(r_s.ok & r_e.ok), Gr)
        suv2, _ = _project_uv(ln_spos[lm_s2], R_cur, t_cur, fx, fy, cx, cy)
        euv2, _ = _project_uv(ln_epos[lm_s2], R_cur, t_cur, fx, fy, cx, cy)
        ri_s2, ri_e2 = _segment_anchor_inputs(
            lm_s2, sel_s2, suv2, euv2, ln_spos, ln_epos, ln_anchor_kf,
            ln_anchor_suv, ln_anchor_euv, ln_anchor_sf, ln_anchor_ef,
            ln_anchor_level, kf_R, kf_t, R_cur, t_cur)
        ri2 = jax.tree.map(lambda *xs: jnp.concatenate(xs),
                           ri_p2, ri_s2, ri_e2)
        res2 = _refine(kf_pyr_stack, cur_pyr, ri2, fx, fy, cx, cy,
                       patch_size=patch_size, has_edgelets=has_edgelets)
        r_p2 = jax.tree.map(lambda a: a[:Mr], res2)
        r_s2 = jax.tree.map(lambda a: a[Mr:Mr + Gr], res2)
        r_e2 = jax.tree.map(lambda a: a[Mr + Gr:], res2)
        cat = lambda a, b: jnp.concatenate([a, b])
        lm_p = cat(lm_p, lm_p2)
        sel_p = cat(sel_p, sel_p2)
        r_p = jax.tree.map(cat, r_p, r_p2)
        lm_s = cat(lm_s, lm_s2)
        sel_s = cat(sel_s, sel_s2)
        r_s = jax.tree.map(cat, r_s, r_s2)
        r_e = jax.tree.map(cat, r_e, r_e2)

    pt_res = ReprojResult(
        lm_idx=lm_p, selected=sel_p, uv=r_p.uv, level=r_p.level,
        matched=r_p.ok & sel_p,
        n_attempts=jnp.sum(sel_p).astype(jnp.int32),
        n_matches=jnp.sum(r_p.ok & sel_p).astype(jnp.int32))
    both = r_s.ok & r_e.ok & sel_s
    seg_res = ReprojSegResult(
        lm_idx=lm_s, selected=sel_s, s_uv=r_s.uv, e_uv=r_e.uv,
        level=jnp.maximum(r_s.level, r_e.level), matched=both,
        n_attempts=jnp.sum(sel_s).astype(jnp.int32),
        n_matches=jnp.sum(both).astype(jnp.int32))
    return pt_res, seg_res
