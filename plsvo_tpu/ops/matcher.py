"""Matcher ops: affine warp, search-level selection, batched patch warping,
epipolar ZMSSD search, two-view triangulation.

TPU-native rebuild of the reference Matcher (reference: src/matcher.cpp —
getWarpMatrixAffine :44-71, getBestSearchLevel :73-86, warpAffine :88-129,
depthFromTriangulation :133-146, findMatchDirect :159-275,
findEpipolarMatchDirect :277-420). Everything is batched over the feature
axis; per-feature pyramid-level divergence is handled by evaluating the
(small, static) set of levels and masking.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from plsvo_tpu.batlin import inv2x2
from plsvo_tpu.image import bilinear_sample
from plsvo_tpu.ops.feature_align import align2d, ref_patch_gradients


def get_warp_affine(
    fx, fy, cx, cy,
    uv_ref: jnp.ndarray,  # (N,2) level-0 px in ref
    f_ref: jnp.ndarray,  # (N,3) unit bearings in ref
    depth_ref: jnp.ndarray,  # (N,) range along bearing
    level_ref: jnp.ndarray,  # (N,) int32 anchor pyramid level
    R_cur_ref: jnp.ndarray,
    t_cur_ref: jnp.ndarray,
    halfpatch: int = 5,  # 8/2 + 2 border/2 (matcher.cpp:52)
) -> jnp.ndarray:
    """First-order affine warp A_cur_ref (N,2,2) from projecting the 3 points
    (px, px+du, px+dv) (reference: matcher.cpp:44-71)."""
    xyz_ref = f_ref * depth_ref[..., None]
    step = (1 << level_ref).astype(uv_ref.dtype)[..., None]  # (N,1)
    du = jnp.stack([jnp.full_like(depth_ref, halfpatch), jnp.zeros_like(depth_ref)], -1) * step
    dv = jnp.stack([jnp.zeros_like(depth_ref), jnp.full_like(depth_ref, halfpatch)], -1) * step

    def unproject_z(uv):
        x = (uv[..., 0] - cx) / fx
        y = (uv[..., 1] - cy) / fy
        return jnp.stack([x, y, jnp.ones_like(x)], -1)

    # scale the du/dv rays to the same z as xyz_ref (matcher.cpp:56-59)
    r_du = unproject_z(uv_ref + du)
    r_dv = unproject_z(uv_ref + dv)
    xyz_du = r_du * (xyz_ref[..., 2:3] / r_du[..., 2:3])
    xyz_dv = r_dv * (xyz_ref[..., 2:3] / r_dv[..., 2:3])

    def proj_cur(p):
        q = jnp.einsum("ij,...j->...i", R_cur_ref, p) + t_cur_ref
        z = jnp.where(jnp.abs(q[..., 2]) < 1e-10, 1e-10, q[..., 2])
        return jnp.stack([fx * q[..., 0] / z + cx, fy * q[..., 1] / z + cy], -1)

    px = proj_cur(xyz_ref)
    col0 = (proj_cur(xyz_du) - px) / halfpatch
    col1 = (proj_cur(xyz_dv) - px) / halfpatch
    return jnp.stack([col0, col1], axis=-1)  # (N,2,2) columns


def best_search_level(A_cur_ref: jnp.ndarray, max_level: int) -> jnp.ndarray:
    """Pyramid level where the warped patch's area is <= 3 (matcher.cpp:73-86)."""
    D = jnp.abs(
        A_cur_ref[..., 0, 0] * A_cur_ref[..., 1, 1]
        - A_cur_ref[..., 0, 1] * A_cur_ref[..., 1, 0]
    )
    # smallest L with D / 4^L <= 3
    L = jnp.ceil(jnp.log2(jnp.maximum(D / 3.0, 1e-6)) * 0.5)
    return jnp.clip(L.astype(jnp.int32), 0, max_level)


@partial(jax.jit, static_argnames=("patch_size",))
def warp_patches_affine(
    pyr_stack: Sequence[jnp.ndarray],  # list over levels of (K, h_l, w_l)
    kf_idx: jnp.ndarray,  # (N,) which ref image in the stack
    uv_ref: jnp.ndarray,  # (N,2) level-0 px of the anchor feature
    level_ref: jnp.ndarray,  # (N,) anchor level
    A_ref_cur: jnp.ndarray,  # (N,2,2) inverse warp (maps cur->ref offsets)
    search_level: jnp.ndarray,  # (N,)
    patch_size: int = 8,
):
    """Extract warped (patch_size+2)^2 bordered reference patches
    (reference: warpAffine matcher.cpp:88-129).

    Sampling positions: ref_pos = uv_ref/2^level_ref + A_ref_cur @ (offs *
    2^search_level), evaluated on the anchor level image — A_ref_cur maps
    cur level-0 offsets into ref ANCHOR-level pixel units (see
    get_warp_affine: its input unit is 2^level_ref ref px, matcher.cpp:52-59)."""
    B = patch_size + 2
    half = B / 2.0
    r = jnp.arange(B, dtype=jnp.float32) - half + 0.5
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([ox.ravel(), oy.ravel()], -1)  # (B*B, 2) search-level units

    N = uv_ref.shape[0]
    sl = (1 << search_level).astype(jnp.float32)[:, None, None]
    # cur-frame level-0 offsets -> ref level-0 offsets
    offs_cur0 = offs[None] * sl  # (N,B*B,2)
    offs_ref0 = jnp.einsum("nij,npj->npi", A_ref_cur, offs_cur0)

    out = jnp.zeros((N, B * B), jnp.float32)
    ok_out = jnp.zeros((N,), bool)
    for lvl, imgs in enumerate(pyr_stack):
        scale = 1.0 / (1 << lvl)
        # offs_ref0 is already in anchor-level pixel units; only the anchor
        # position converts from level-0 coords
        pos = uv_ref[:, None, :] * scale + offs_ref0
        # gather from each feature's own keyframe image at this level
        vals, ok = jax.vmap(lambda img, p: bilinear_sample(img, p))(imgs[kf_idx], pos)
        sel = level_ref == lvl
        out = jnp.where(sel[:, None], vals, out)
        ok_out = jnp.where(sel, jnp.all(ok, axis=-1), ok_out)
    return out, ok_out  # (N, (P+2)^2), (N,)


class EpipolarResult(NamedTuple):
    uv_level: jnp.ndarray  # (N,2) best-match px at the search level
    zmssd: jnp.ndarray  # (N,) best score
    ok: jnp.ndarray  # (N,) score under threshold


def zmssd(ref_patch: jnp.ndarray, cur_patch: jnp.ndarray, axis=-1):
    """Zero-mean sum of squared differences (vk::patch_score::ZMSSD analogue,
    used at matcher.cpp:360-390)."""
    r = ref_patch - jnp.mean(ref_patch, axis=axis, keepdims=True)
    c = cur_patch - jnp.mean(cur_patch, axis=axis, keepdims=True)
    return jnp.sum((r - c) ** 2, axis=axis)


@partial(jax.jit, static_argnames=("patch_size", "n_steps"))
def epipolar_search_zmssd(
    cur_pyr: Sequence[jnp.ndarray],
    ref_patch: jnp.ndarray,  # (N, P) interior ref patches (already warped)
    f_A: jnp.ndarray,  # (N,3) bearing of endpoint at max depth (unit-plane ray)
    f_B: jnp.ndarray,  # (N,3) bearing at min depth
    search_level: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,)
    fx, fy, cx, cy,
    *,
    patch_size: int = 8,
    n_steps: int = 64,
    threshold_factor: float = 2000.0,
) -> EpipolarResult:
    """Sample ZMSSD along the epipolar segment between the projections of
    the two depth-extreme bearings, in the CURRENT frame at each feature's
    search level (reference: matcher.cpp:277-420; fixed step budget per
    SURVEY §7.2 vs the reference's 0.7px stepping capped at 1000).

    Threshold: ZMSSD < threshold_factor * patch_area
    (vk ZMSSD::threshold_ = 2000 * patch_area)."""
    N, P = ref_patch.shape
    f32 = jnp.float32
    # unit-plane coords of the two extremes
    uvA = f_A[..., :2] / f_A[..., 2:3]
    uvB = f_B[..., :2] / f_B[..., 2:3]
    alphas = jnp.linspace(0.0, 1.0, n_steps, dtype=f32)
    uv_n = uvA[:, None, :] + alphas[None, :, None] * (uvB - uvA)[:, None, :]  # (N,S,2)
    px0 = jnp.stack([fx * uv_n[..., 0] + cx, fy * uv_n[..., 1] + cy], -1)  # level-0

    half = patch_size / 2.0
    r = jnp.arange(patch_size, dtype=f32) - half + 0.5
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([ox.ravel(), oy.ravel()], -1)  # (P,2)

    best = jnp.full((N,), jnp.inf, f32)
    best_uv = jnp.zeros((N, 2), f32)
    ref_zm = ref_patch - jnp.mean(ref_patch, axis=-1, keepdims=True)
    for lvl, img in enumerate(cur_pyr):
        scale = f32(1.0 / (1 << lvl))
        pos = px0[..., None, :] * scale + offs[None, None]  # (N,S,P,2)
        vals, ok = bilinear_sample(img, pos)
        oks = jnp.all(ok, axis=-1)  # (N,S)
        cur_zm = vals - jnp.mean(vals, axis=-1, keepdims=True)
        score = jnp.sum((ref_zm[:, None, :] - cur_zm) ** 2, axis=-1)  # (N,S)
        score = jnp.where(oks, score, jnp.inf)
        sbest = jnp.min(score, axis=-1)
        sidx = jnp.argmin(score, axis=-1)
        uv_lvl = px0[jnp.arange(N), sidx] * scale
        sel = search_level == lvl
        better = sel & (sbest < best)
        best = jnp.where(better, sbest, best)
        best_uv = jnp.where(better[:, None], uv_lvl, best_uv)
    ok = valid & (best < threshold_factor * P)
    return EpipolarResult(uv_level=best_uv, zmssd=best, ok=ok)


def triangulate_depth(
    R_cur_ref: jnp.ndarray, t_cur_ref: jnp.ndarray,
    f_ref: jnp.ndarray, f_cur: jnp.ndarray,
):
    """Two-view least-squares depths (reference: depthFromTriangulation,
    matcher.cpp:133-146). Returns (depth_ref, depth_cur, ok);
    d_ref*(R f_ref) - d_cur*f_cur = -t. R/t may be batched (...,3,3)/(...,3)."""
    Rf = jnp.einsum("...ij,...j->...i", R_cur_ref, f_ref)
    # A = [Rf, -f_cur]: (...,3,2)
    A = jnp.stack([Rf, -f_cur], axis=-1)
    AtA = jnp.einsum("...ik,...il->...kl", A, A)
    Atb = jnp.einsum("...ik,...i->...k", A, -t_cur_ref)
    det = AtA[..., 0, 0] * AtA[..., 1, 1] - AtA[..., 0, 1] * AtA[..., 1, 0]
    ok = jnp.abs(det) > 1e-10
    det_s = jnp.where(ok, det, 1.0)
    d_ref = (AtA[..., 1, 1] * Atb[..., 0] - AtA[..., 0, 1] * Atb[..., 1]) / det_s
    d_cur = (AtA[..., 0, 0] * Atb[..., 1] - AtA[..., 1, 0] * Atb[..., 0]) / det_s
    ok = ok & (d_ref > 0) & (d_cur > 0)
    return d_ref, d_cur, ok


class MatchResult(NamedTuple):
    uv: jnp.ndarray  # (N,2) refined level-0 positions in cur frame
    level: jnp.ndarray  # (N,) search level used
    ok: jnp.ndarray  # (N,)


@partial(jax.jit, static_argnames=("patch_size", "n_iter", "max_level"))
def find_match_direct(
    ref_pyr_stack: Sequence[jnp.ndarray],  # list over levels of (K,h,w)
    cur_pyr: Sequence[jnp.ndarray],  # list over levels of (h,w)
    kf_idx: jnp.ndarray,  # (N,)
    uv_ref: jnp.ndarray,  # (N,2) anchor feature px (level-0)
    f_ref: jnp.ndarray,  # (N,3) anchor bearing
    depth_ref: jnp.ndarray,  # (N,) range in anchor frame
    level_ref: jnp.ndarray,  # (N,)
    R_cur_ref: jnp.ndarray, t_cur_ref: jnp.ndarray,  # (N,3,3), (N,3) per-feature!
    uv_cur_init: jnp.ndarray,  # (N,2) projected level-0 position in cur
    valid: jnp.ndarray,
    fx, fy, cx, cy,
    *,
    patch_size: int = 8,
    n_iter: int = 10,
    max_level: int = 4,
) -> MatchResult:
    """Batched Matcher::findMatchDirect (reference: matcher.cpp:159-207):
    affine warp the anchor patch, pick the best search level, then align2D
    in the current frame at that level. R/t are per-feature because each
    anchor lives in its own keyframe."""
    N = uv_ref.shape[0]
    A = jax.vmap(
        lambda uv, f, d, lv, R, t: get_warp_affine(
            fx, fy, cx, cy, uv[None], f[None], d[None], lv[None], R, t
        )[0]
    )(uv_ref, f_ref, depth_ref, level_ref, R_cur_ref, t_cur_ref)
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    A_ok = jnp.abs(det) > 1e-6
    A_inv = inv2x2(jnp.where(A_ok[:, None, None], A, jnp.eye(2)))
    slevel = best_search_level(A, max_level)

    patches_b, warp_ok = warp_patches_affine(
        ref_pyr_stack, kf_idx, uv_ref, level_ref, A_inv, slevel,
        patch_size=patch_size)
    ref_patch, ref_dx, ref_dy = ref_patch_gradients(patches_b, patch_size)

    ok0 = valid & warp_ok & A_ok
    uv_out = uv_cur_init
    conv_out = jnp.zeros((N,), bool)
    for lvl in range(len(cur_pyr)):
        scale = 1.0 / (1 << lvl)
        res = align2d(
            cur_pyr[lvl], ref_patch, ref_dx, ref_dy, uv_cur_init * scale,
            ok0 & (slevel == lvl), patch_size=patch_size, n_iter=n_iter)
        sel = slevel == lvl
        uv_out = jnp.where(sel[:, None], res.uv / scale, uv_out)
        conv_out = jnp.where(sel, res.converged, conv_out)
    return MatchResult(uv=uv_out, level=slevel, ok=conv_out & ok0)


# ---------------------------------------------------------------------------
# Atlas-based variants: per-feature pyramid levels resolved through a packed
# pyramid atlas (image.pack_pyramid_atlas) — one gather pass for the whole
# batch instead of a python loop over levels with masking. Same math as the
# per-level versions above; used by the pipeline hot path.
# ---------------------------------------------------------------------------
from plsvo_tpu.image import bilinear_sample_atlas  # noqa: E402
from plsvo_tpu.ops.feature_align import (align2d_atlas,  # noqa: E402
                                         align_mixed_atlas)


@partial(jax.jit, static_argnames=("patch_size", "window"))
def warp_patches_affine_atlas(
    kf_flat,  # image.FlatAtlas — pre-packed keyframe pyramid super-atlas
    kf_idx: jnp.ndarray,  # (N,)
    uv_ref: jnp.ndarray,  # (N,2) level-0 anchor px
    level_ref: jnp.ndarray,  # (N,)
    A_ref_cur: jnp.ndarray,  # (N,2,2)
    search_level: jnp.ndarray,  # (N,)
    patch_size: int = 8,
    window: int = 24,
):
    """warp_patches_affine through each feature's own keyframe atlas.

    kf_flat is the flat-packed super-atlas (image.pack_pyramid_atlas_flat)
    — built once per keyframe change (MapState cache), not per frame.

    Sampling mechanism: ONE contiguous (window x window) slice-gather per
    feature around the warped-patch center, then all (P+2)^2 warped taps
    are bilinear-interpolated IN-REGISTER from the window
    (image.sample_in_window soft-one-hot contraction) — replacing the
    previous per-tap gather, which paid a pack_bilinear of the whole flat
    atlas (4x its size in HBM traffic) plus (P+2)^2 scattered 4-float
    gather segments per feature. Measured ~5x faster at production sizes.

    When the warp's tap spacing exceeds 1 anchor-level px (zoomed-out
    current view, or a search level bumped for a long epipolar band), the
    anchor patch is sampled from a correspondingly COARSER anchor pyramid
    level so the taps stay within the window — a deliberate divergence
    from the reference, which samples the anchor level with arbitrarily
    wide (aliased) tap spacing (matcher.cpp:88-129); the coarser level is
    the anti-aliased version of the same texture. Warps too extreme even
    for the coarsest available level fail (ok=False), behaving like any
    failed match."""
    from plsvo_tpu.image import gather_windows_raw, sample_in_window

    B = patch_size + 2
    half = B / 2.0
    r = jnp.arange(B, dtype=jnp.float32) - half + 0.5
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([ox.ravel(), oy.ravel()], -1)  # (B*B,2)

    N = uv_ref.shape[0]
    max_level = kf_flat.sizes.shape[0] - 1
    sl = (1 << search_level).astype(jnp.float32)[:, None, None]
    offs_cur0 = offs[None] * sl
    offs_ref = jnp.einsum("nij,npj->npi", A_ref_cur, offs_cur0)  # anchor-level units
    # tap spacing in anchor-level px = column norms of A_ref_cur * 2^sl;
    # bump the anchor level until spacing < 2 so taps fit the window
    # (ordinary tracking warps have spacing ~0.6-1.2 and never bump —
    # only long-band level bumps / extreme zoom-outs trigger this)
    spacing = jnp.sqrt(jnp.maximum(
        jnp.sum(A_ref_cur * A_ref_cur, axis=1).max(axis=-1), 1e-12)
    ) * sl[:, 0, 0]
    extra = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(spacing / 1.9, 1.0))
                              ).astype(jnp.int32),
                     0, jnp.maximum(max_level - level_ref, 0))
    lvl_eff = level_ref + extra
    rescale = 1.0 / (1 << extra).astype(jnp.float32)
    scale_ref = 1.0 / (1 << lvl_eff).astype(jnp.float32)
    center = uv_ref * scale_ref[:, None]  # (N,2) effective-level coords
    pos = center[:, None, :] + offs_ref * rescale[:, None, None]  # (N,BB,2)

    lvl = lvl_eff[:, None]
    h = kf_flat.sizes[lvl, 0].astype(jnp.float32)
    w = kf_flat.sizes[lvl, 1].astype(jnp.float32)
    u = pos[..., 0]
    v = pos[..., 1]
    # 1px-interior parity with bilinear_sample's support check
    in_level = (u >= 0) & (v >= 0) & (u <= w - 1) & (v <= h - 1)

    H, Wt = kf_flat.flat.shape
    wp = window
    xo = (kf_flat.x_off[lvl_eff]
          + (kf_idx * kf_flat.width.astype(jnp.int32)).astype(jnp.int32))
    cu = jnp.clip(jnp.floor(center[:, 0]).astype(jnp.int32) - wp // 2 + 1
                  + xo, 0, max(Wt - wp, 0))
    cv = jnp.clip(jnp.floor(center[:, 1]).astype(jnp.int32) - wp // 2 + 1,
                  0, max(H - wp, 0))
    win = gather_windows_raw(kf_flat.flat, jnp.stack([cu, cv], -1), wp)
    corner = jnp.stack([cu.astype(jnp.float32) - xo.astype(jnp.float32),
                        cv.astype(jnp.float32)], -1)
    vals, ok = sample_in_window(win, corner, pos)
    vals = jnp.where(in_level, vals, 0.0)
    return vals, jnp.all(in_level & ok, axis=-1)


@partial(jax.jit, static_argnames=("patch_size", "n_steps"))
def epipolar_search_zmssd_atlas(
    cur_atlas: jnp.ndarray, x_off: jnp.ndarray, sizes: jnp.ndarray,
    ref_patch: jnp.ndarray,  # (N,P)
    f_A: jnp.ndarray, f_B: jnp.ndarray,
    search_level: jnp.ndarray,
    valid: jnp.ndarray,
    fx, fy, cx, cy,
    *,
    patch_size: int = 8,
    n_steps: int = 64,
    threshold_factor: float = 2000.0,
) -> EpipolarResult:
    """epipolar_search_zmssd with one atlas gather pass."""
    N, P = ref_patch.shape
    f32 = jnp.float32
    uvA = f_A[..., :2] / f_A[..., 2:3]
    uvB = f_B[..., :2] / f_B[..., 2:3]
    alphas = jnp.linspace(0.0, 1.0, n_steps, dtype=f32)
    uv_n = uvA[:, None, :] + alphas[None, :, None] * (uvB - uvA)[:, None, :]
    px0 = jnp.stack([fx * uv_n[..., 0] + cx, fy * uv_n[..., 1] + cy], -1)

    half = patch_size / 2.0
    r = jnp.arange(patch_size, dtype=f32) - half + 0.5
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([ox.ravel(), oy.ravel()], -1)

    scale = 1.0 / (1 << search_level).astype(f32)
    pos = px0[..., None, :] * scale[:, None, None, None] + offs[None, None]
    vals, ok = bilinear_sample_atlas(
        cur_atlas, x_off, sizes, pos, search_level[:, None, None])
    oks = jnp.all(ok, axis=-1)  # (N,S)
    ref_zm = ref_patch - jnp.mean(ref_patch, axis=-1, keepdims=True)
    cur_zm = vals - jnp.mean(vals, axis=-1, keepdims=True)
    score = jnp.sum((ref_zm[:, None, :] - cur_zm) ** 2, axis=-1)
    score = jnp.where(oks, score, jnp.inf)
    best = jnp.min(score, axis=-1)
    sidx = jnp.argmin(score, axis=-1)
    uv_lvl = px0[jnp.arange(N), sidx] * scale[:, None]
    ok_out = valid & (best < threshold_factor * P) & jnp.isfinite(best)
    return EpipolarResult(uv_level=uv_lvl, zmssd=best, ok=ok_out)


@partial(jax.jit, static_argnames=("patch_size", "n_iter", "max_level",
                                   "has_edgelets"))
def find_match_direct_atlas(
    kf_flat,  # image.FlatAtlas of the keyframe pyramids
    cur_atlas: jnp.ndarray, cur_x_off: jnp.ndarray, cur_sizes: jnp.ndarray,
    kf_idx: jnp.ndarray,
    uv_ref: jnp.ndarray, f_ref: jnp.ndarray, depth_ref: jnp.ndarray,
    level_ref: jnp.ndarray,
    R_cur_ref: jnp.ndarray, t_cur_ref: jnp.ndarray,
    uv_cur_init: jnp.ndarray, valid: jnp.ndarray,
    fx, fy, cx, cy,
    ftype: jnp.ndarray = None,  # (N,) int32: 0=corner, 1=edgelet
    grad_dir: jnp.ndarray = None,  # (N,2) anchor-level gradient direction
    *,
    patch_size: int = 8,
    n_iter: int = 10,
    max_level: int = 2,
    has_edgelets: bool = False,
) -> MatchResult:
    """find_match_direct with atlas sampling on both the anchor keyframes
    and the current frame (single gather pass each).

    With has_edgelets, EDGELET rows refine via align1D along the WARPED
    dominant-gradient direction (reference: matcher.cpp:191-207
    `dir_cur = A_cur_ref * ref_ftr->grad`), corners via align2D; the two
    batched aligners run on complementary masks and the results merge."""
    N = uv_ref.shape[0]
    A = jax.vmap(
        lambda uv, f, d, lv, R, t: get_warp_affine(
            fx, fy, cx, cy, uv[None], f[None], d[None], lv[None], R, t)[0]
    )(uv_ref, f_ref, depth_ref, level_ref, R_cur_ref, t_cur_ref)
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    A_ok = jnp.abs(det) > 1e-6
    A_inv = inv2x2(jnp.where(A_ok[:, None, None], A, jnp.eye(2)))
    slevel = best_search_level(A, max_level)

    patches_b, warp_ok = warp_patches_affine_atlas(
        kf_flat, kf_idx, uv_ref, level_ref, A_inv,
        slevel, patch_size=patch_size)
    ref_patch, ref_dx, ref_dy = ref_patch_gradients(patches_b, patch_size)

    ok0 = valid & warp_ok & A_ok
    scale = 1.0 / (1 << slevel).astype(jnp.float32)
    if has_edgelets and ftype is not None:
        # warp the anchor-level gradient direction into the current frame
        # (A maps ref anchor-level offsets -> cur level-0 px offsets;
        # direction magnitude is irrelevant after normalization); one
        # mixed-mode GN loop refines corners 2-D and edgelets 1-D along
        # the warped direction, sharing the window resample
        is_edge = ftype == 1
        d_cur = jnp.einsum("nij,nj->ni", A, grad_dir)
        res = align_mixed_atlas(
            cur_atlas, cur_x_off, cur_sizes, ref_patch, ref_dx, ref_dy,
            uv_cur_init * scale[:, None], d_cur, is_edge, slevel, ok0,
            patch_size=patch_size, n_iter=n_iter)
    else:
        res = align2d_atlas(
            cur_atlas, cur_x_off, cur_sizes, ref_patch, ref_dx, ref_dy,
            uv_cur_init * scale[:, None], slevel, ok0,
            patch_size=patch_size, n_iter=n_iter)
    uv_out = res.uv / scale[:, None]
    return MatchResult(uv=uv_out, level=slevel, ok=res.converged & ok0)


@partial(jax.jit, static_argnames=("patch_size", "n_steps"))
def epipolar_search_sliding_atlas(
    cur_atlas: jnp.ndarray, x_off: jnp.ndarray, sizes: jnp.ndarray,
    ref_patch_border: jnp.ndarray,  # (N, (P+2)^2) bordered axis-aligned patches
    f_A: jnp.ndarray, f_B: jnp.ndarray,  # cur-frame rays of depth extremes
    search_level: jnp.ndarray,
    valid: jnp.ndarray,
    fx, fy, cx, cy,
    *,
    patch_size: int = 8,
    n_steps: int = 48,
    threshold_factor: float = 2000.0,
) -> EpipolarResult:
    """Sliding-window epipolar ZMSSD: the band is sampled ONCE as a
    (n_steps+P) x P window in epipolar-rotated coordinates (1px steps at the
    search level, like the reference's 0.7px walk, matcher.cpp:347-360);
    each step's patch is a slice of the window — ~Px fewer image taps than
    sampling an independent patch per step. The reference patch is resampled
    at the rotated offsets from its bordered axis-aligned warp."""
    N = ref_patch_border.shape[0]
    P = patch_size
    PP = P * P
    f32 = jnp.float32

    uvA0 = jnp.stack([fx * f_A[:, 0] / f_A[:, 2] + cx,
                      fy * f_A[:, 1] / f_A[:, 2] + cy], -1)
    uvB0 = jnp.stack([fx * f_B[:, 0] / f_B[:, 2] + cx,
                      fy * f_B[:, 1] / f_B[:, 2] + cy], -1)
    scale = 1.0 / (1 << search_level).astype(f32)
    uvA = uvA0 * scale[:, None]
    uvB = uvB0 * scale[:, None]
    band = jnp.linalg.norm(uvB - uvA, axis=-1)  # px at search level
    d = (uvB - uvA) / jnp.maximum(band, 1e-6)[:, None]
    d = jnp.where(band[:, None] > 1e-6, d, jnp.asarray([[1.0, 0.0]], f32))
    nvec = jnp.stack([-d[:, 1], d[:, 0]], -1)

    # band samples: rows i along the epipolar dir, cols j across. Sampled
    # from ONE contiguous axis-aligned bounding window per seed
    # (image.gather_windows_raw + soft-one-hot in-window interpolation)
    # instead of per-tap gathers through a packed atlas — the rotated band
    # of <= n_steps+P taps fits a static (wb x wb) box since the level
    # bump caps the band length at n_steps px (ops/depth_filter.py).
    W_rows = n_steps + P
    ii = jnp.arange(W_rows, dtype=f32) - (P / 2.0 - 0.5)
    jj = jnp.arange(P, dtype=f32) - (P / 2.0 - 0.5)
    pos = (uvA[:, None, None, :]
           + d[:, None, None, :] * ii[None, :, None, None]
           + nvec[:, None, None, :] * jj[None, None, :, None])  # (N,WR,P,2)
    from plsvo_tpu.image import gather_windows_raw, sample_in_window

    h_lvl = sizes[search_level, 0].astype(f32)
    w_lvl = sizes[search_level, 1].astype(f32)
    in_lvl = ((pos[..., 0] >= 0) & (pos[..., 1] >= 0)
              & (pos[..., 0] <= w_lvl[:, None, None] - 1)
              & (pos[..., 1] <= h_lvl[:, None, None] - 1))
    wb = W_rows + P + 4
    Hf, Wf = cur_atlas.shape
    mid = 0.5 * (uvA + uvB)
    xo = x_off[search_level]
    cu = jnp.clip(jnp.floor(mid[:, 0]).astype(jnp.int32) - wb // 2 + xo,
                  0, max(Wf - wb, 0))
    cv = jnp.clip(jnp.floor(mid[:, 1]).astype(jnp.int32) - wb // 2,
                  0, max(Hf - wb, 0))
    band_win = gather_windows_raw(cur_atlas, jnp.stack([cu, cv], -1), wb)
    band_corner = jnp.stack([(cu - xo).astype(f32), cv.astype(f32)], -1)
    vals, ok_w = sample_in_window(band_win, band_corner,
                                  pos.reshape(N, W_rows * P, 2))
    win = jnp.where(in_lvl, vals.reshape(N, W_rows, P), 0.0)
    ok = ok_w.reshape(N, W_rows, P) & in_lvl

    # rotated resampling of the bordered ref patch (tiny local gather)
    B = P + 2
    center = (B - 1) / 2.0
    from plsvo_tpu.image import patch_offsets

    offs = patch_offsets(P, f32)  # (PP,2) in (along, across) order
    rot = (d[:, None, :] * offs[None, :, 0:1]
           + nvec[:, None, :] * offs[None, :, 1:2])  # (N,PP,2)
    ref_imgs = ref_patch_border.reshape(N, B, B)
    rpos = rot + center
    ref_rot, rok = jax.vmap(bilinear_sample)(ref_imgs, rpos)
    ref_ok = jnp.all(rok, axis=-1)

    # sliding ZMSSD: patch for step s = window rows s..s+P-1
    s_idx = jnp.arange(n_steps)[:, None] + jnp.arange(P)[None, :]  # (S,P)
    patches = win[:, s_idx, :]  # (N,S,P,P)
    pok = jnp.all(ok[:, s_idx, :], axis=(2, 3))  # (N,S)
    step_on = (jnp.arange(n_steps, dtype=f32)[None, :]
               <= jnp.maximum(band, 1.0)[:, None])
    pflat = patches.reshape(N, n_steps, PP)
    cur_zm = pflat - jnp.mean(pflat, axis=-1, keepdims=True)
    ref_zm = ref_rot - jnp.mean(ref_rot, axis=-1, keepdims=True)
    score = jnp.sum((ref_zm[:, None, :] - cur_zm) ** 2, axis=-1)
    score = jnp.where(pok & step_on, score, jnp.inf)
    best = jnp.min(score, axis=-1)
    sbest = jnp.argmin(score, axis=-1).astype(f32)
    uv_lvl = uvA + d * sbest[:, None]
    ok_out = valid & ref_ok & (best < threshold_factor * PP) & jnp.isfinite(best)
    return EpipolarResult(uv_level=uv_lvl, zmssd=best, ok=ok_out)
