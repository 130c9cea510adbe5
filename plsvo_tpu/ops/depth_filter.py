"""Bayesian depth filter: vectorized recursive inverse-depth estimation.

TPU-native rebuild of DepthFilter (reference: src/depth_filter.cpp).
The reference runs a mapping thread that loops over a seed list per frame
(depth_filter.cpp:282-363); here ALL seeds update in one batched dispatch
per frame — the thread+mutex machinery disappears by construction
(SURVEY §7.0).

Model (Vogiatzis & Hernandez Gaussian x Beta, exact parity):
- seed init a=b=10, mu=1/depth_mean, z_range=1/depth_min,
  sigma2=(z_range/6)^2 (depth_filter.cpp:53-61)
- per-frame: epipolar ZMSSD search in the [mu-sigma, mu+sigma]
  inverse-depth band (depth_filter.cpp:307-317), subpixel refinement,
  triangulation, tau from the 1px angular-error triangle
  (computeTau, depth_filter.cpp:568-584)
- Bayes update of (mu, sigma2, a, b) (updatePointSeed,
  depth_filter.cpp:489-512); line seeds update both endpoints with shared
  a,b fused max/min (updateLineSeed, depth_filter.cpp:514-566)
- failed match: b += 1 (depth_filter.cpp:316,326)
- convergence: sqrt(sigma2) < z_range/200 (depth_filter.cpp:332)
- age-out after 3 keyframe batches (depth_filter.cpp:289-292)
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from plsvo_tpu import lie
from plsvo_tpu.ops import matcher as matcher_ops
from plsvo_tpu.ops.feature_align import align2d, ref_patch_gradients


class PointSeeds(NamedTuple):
    """SoA seed table, fixed capacity S (SURVEY §7.0 SeedTable)."""

    kf_idx: jnp.ndarray  # (S,) keyframe slot of the anchor feature
    uv: jnp.ndarray  # (S,2) anchor px (level-0)
    f: jnp.ndarray  # (S,3) anchor unit bearing
    level: jnp.ndarray  # (S,) detection level
    mu: jnp.ndarray  # (S,) inverse-depth mean
    sigma2: jnp.ndarray  # (S,) inverse-depth variance
    z_range: jnp.ndarray  # (S,) inverse-depth prior range
    a: jnp.ndarray  # (S,) Beta inlier count
    b: jnp.ndarray  # (S,) Beta outlier count
    batch_id: jnp.ndarray  # (S,) keyframe batch of creation
    alive: jnp.ndarray  # (S,) bool


class LineSeeds(NamedTuple):
    kf_idx: jnp.ndarray
    s_uv: jnp.ndarray  # (S,2)
    e_uv: jnp.ndarray
    sf: jnp.ndarray  # (S,3)
    ef: jnp.ndarray
    level: jnp.ndarray
    mu_s: jnp.ndarray
    sigma2_s: jnp.ndarray
    z_range_s: jnp.ndarray
    mu_e: jnp.ndarray
    sigma2_e: jnp.ndarray
    z_range_e: jnp.ndarray
    a: jnp.ndarray
    b: jnp.ndarray
    batch_id: jnp.ndarray
    alive: jnp.ndarray


def empty_point_seeds(capacity: int) -> PointSeeds:
    z = jnp.zeros
    return PointSeeds(
        kf_idx=z(capacity, jnp.int32), uv=z((capacity, 2)), f=z((capacity, 3)),
        level=z(capacity, jnp.int32), mu=z(capacity), sigma2=z(capacity),
        z_range=z(capacity), a=z(capacity), b=z(capacity),
        batch_id=z(capacity, jnp.int32), alive=z(capacity, bool))


def empty_line_seeds(capacity: int) -> LineSeeds:
    z = jnp.zeros
    return LineSeeds(
        kf_idx=z(capacity, jnp.int32), s_uv=z((capacity, 2)), e_uv=z((capacity, 2)),
        sf=z((capacity, 3)), ef=z((capacity, 3)), level=z(capacity, jnp.int32),
        mu_s=z(capacity), sigma2_s=z(capacity), z_range_s=z(capacity),
        mu_e=z(capacity), sigma2_e=z(capacity), z_range_e=z(capacity),
        a=z(capacity), b=z(capacity), batch_id=z(capacity, jnp.int32),
        alive=z(capacity, bool))


def seed_init_params(depth_mean, depth_min):
    """(mu, sigma2, z_range) for new seeds (depth_filter.cpp:53-61)."""
    mu = 1.0 / depth_mean
    z_range = 1.0 / depth_min
    sigma2 = z_range * z_range / 36.0
    return mu, sigma2, z_range


def bayes_update(x, tau2, mu, sigma2, a, b, z_range):
    """Vogiatzis Gaussian x Beta update, elementwise
    (reference: updatePointSeed, depth_filter.cpp:489-512).
    Returns (mu', sigma2', a', b', valid)."""
    norm_scale2 = sigma2 + tau2
    s2 = 1.0 / (1.0 / jnp.maximum(sigma2, 1e-20) + 1.0 / jnp.maximum(tau2, 1e-20))
    m = s2 * (mu / jnp.maximum(sigma2, 1e-20) + x / jnp.maximum(tau2, 1e-20))
    pdf = jnp.exp(-0.5 * (x - mu) ** 2 / jnp.maximum(norm_scale2, 1e-20)) / jnp.sqrt(
        2.0 * math.pi * jnp.maximum(norm_scale2, 1e-20))
    C1 = a / (a + b) * pdf
    C2 = b / (a + b) / jnp.maximum(z_range, 1e-20)
    norm = jnp.maximum(C1 + C2, 1e-30)
    C1 = C1 / norm
    C2 = C2 / norm
    ab1 = a + b + 1.0
    ab2 = a + b + 2.0
    f = C1 * (a + 1.0) / ab1 + C2 * a / ab1
    e = (C1 * (a + 1.0) * (a + 2.0) / (ab1 * ab2)
         + C2 * a * (a + 1.0) / (ab1 * ab2))
    mu_new = C1 * m + C2 * mu
    sigma2_new = C1 * (s2 + m * m) + C2 * (sigma2 + mu * mu) - mu_new * mu_new
    # NOTE: the denominator f - e/f is negative in the normal regime — do
    # not clamp it (a sign-blind epsilon guard corrupts a/b catastrophically)
    denom = f - e / jnp.where(jnp.abs(f) < 1e-20, 1e-20, f)
    a_new = (e - f) / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    b_new = a_new * (1.0 - f) / jnp.where(jnp.abs(f) < 1e-20, 1e-20, f)
    ok = (
        jnp.isfinite(mu_new) & jnp.isfinite(sigma2_new)
        & jnp.isfinite(a_new) & jnp.isfinite(b_new) & (sigma2_new > 0)
        & (a_new > 0) & (b_new > 0)
    )
    return mu_new, sigma2_new, a_new, b_new, ok


def compute_tau(t_ref_cur, f, z, px_error_angle):
    """Depth std-dev from a one-pixel angular error triangle
    (reference: computeTau, depth_filter.cpp:568-584). Batched over seeds."""
    t_norm = jnp.linalg.norm(t_ref_cur, axis=-1)
    a_vec = f * z[..., None] - t_ref_cur
    a_norm = jnp.linalg.norm(a_vec, axis=-1)
    dot_ft = jnp.sum(f * t_ref_cur, axis=-1)
    alpha = jnp.arccos(jnp.clip(dot_ft / jnp.maximum(t_norm, 1e-12), -1.0, 1.0))
    dot_at = jnp.sum(a_vec * (-t_ref_cur), axis=-1)
    beta = jnp.arccos(jnp.clip(
        dot_at / jnp.maximum(t_norm * a_norm, 1e-12), -1.0, 1.0))
    beta_plus = beta + px_error_angle
    gamma = math.pi - alpha - beta_plus
    z_plus = t_norm * jnp.sin(beta_plus) / jnp.maximum(jnp.sin(gamma), 1e-12)
    return z_plus - z


class SeedUpdateResult(NamedTuple):
    seeds: PointSeeds
    converged: jnp.ndarray  # (S,) harvest now
    matched: jnp.ndarray  # (S,) got an epipolar match this frame
    depth_converged: jnp.ndarray  # (S,) 1/mu for harvested seeds
    skipped: jnp.ndarray = jnp.zeros((0,), bool)  # (S,) budget-starved
    #   this frame: searchable long-band seeds deferred by
    #   seed_search_budget without a search or a penalty — surfaced so the
    #   permon `seed_starved` channel can expose systematic starvation


@partial(jax.jit, static_argnames=("patch_size", "n_epi_steps", "max_seed_kfs",
                                   "sigma_conv_factor", "max_search"))
def update_point_seeds(
    seeds: PointSeeds,
    kf_R_w: jnp.ndarray,  # (K,3,3) keyframe poses cam->world
    kf_t_w: jnp.ndarray,  # (K,3)
    kf_pyr_stack: Sequence[jnp.ndarray],  # list over levels of (K,h,w)
    cur_pyr: Sequence[jnp.ndarray],
    R_w_cur: jnp.ndarray, t_w_cur: jnp.ndarray,
    fx, fy, cx, cy,
    batch_counter: jnp.ndarray,
    *,
    patch_size: int = 8,
    n_epi_steps: int = 64,
    max_seed_kfs: int = 3,
    sigma_conv_factor: float = 200.0,
    max_search: int = 0,
) -> SeedUpdateResult:
    """One frame's worth of seed updates, all seeds at once
    (reference: updatePointSeeds, depth_filter.cpp:282-363).

    max_search > 0 enables the short-epipolar split (reference:
    matcher.cpp:325-345 — a band under ~2 px skips the ZMSSD walk and goes
    straight to subpixel alignment): only the `max_search` seeds with the
    LONGEST epipolar bands run the sliding-window search (its window gather
    dominates the whole update's cost); converged-ish seeds with sub-2px
    bands align directly from the mean-depth projection; seeds that are
    neither (long band but out of search budget) are skipped this frame
    without an outlier penalty — the reference's bounded mapping queue
    drops frames under load the same way (depth_filter.cpp:116-131)."""
    f32 = jnp.float32
    S = seeds.mu.shape[0]

    # age-out (depth_filter.cpp:289-292)
    alive = seeds.alive & ((batch_counter - seeds.batch_id) <= max_seed_kfs)

    # per-seed relative pose T_cur_ref = T_cur_w * T_w_kf
    R_kf = kf_R_w[seeds.kf_idx]  # (S,3,3) cam->world
    t_kf = kf_t_w[seeds.kf_idx]
    R_cw, t_cw = lie.inverse(R_w_cur, t_w_cur)
    R_cr = jnp.einsum("ij,sjk->sik", R_cw, R_kf)
    t_cr = jnp.einsum("ij,sj->si", R_cw, t_kf) + t_cw

    # visibility at the mean depth
    depth = 1.0 / jnp.maximum(seeds.mu, 1e-10)
    xyz_ref = seeds.f * depth[:, None]
    xyz_cur = jnp.einsum("sij,sj->si", R_cr, xyz_ref) + t_cr
    z_ok = xyz_cur[:, 2] > 0.1
    uv_cur = jnp.stack([
        fx * xyz_cur[:, 0] / jnp.maximum(xyz_cur[:, 2], 1e-6) + cx,
        fy * xyz_cur[:, 1] / jnp.maximum(xyz_cur[:, 2], 1e-6) + cy], -1)
    H0, W0 = cur_pyr[0].shape
    margin = patch_size
    in_frame = (
        (uv_cur[:, 0] > margin) & (uv_cur[:, 0] < W0 - margin)
        & (uv_cur[:, 1] > margin) & (uv_cur[:, 1] < H0 - margin))
    visible = alive & z_ok & in_frame

    # epipolar band from the inverse-depth interval [mu - sigma, mu + sigma]
    sigma = jnp.sqrt(jnp.maximum(seeds.sigma2, 0.0))
    i_min = jnp.maximum(seeds.mu - sigma, 1e-7)  # farthest (smallest idepth)
    i_max = seeds.mu + sigma
    d_max = 1.0 / i_min
    d_min = 1.0 / i_max
    xyz_far = jnp.einsum("sij,sj->si", R_cr, seeds.f * d_max[:, None]) + t_cr
    xyz_near = jnp.einsum("sij,sj->si", R_cr, seeds.f * d_min[:, None]) + t_cr

    # warped reference patches at the best search level
    A = jax.vmap(
        lambda uv, f, d, lv, R, t: matcher_ops.get_warp_affine(
            fx, fy, cx, cy, uv[None], f[None], d[None], lv[None], R, t)[0]
    )(seeds.uv, seeds.f, depth, seeds.level, R_cr, t_cr)
    detA = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    A_ok = jnp.abs(detA) > 1e-6
    from plsvo_tpu.batlin import inv2x2
    A_inv = inv2x2(jnp.where(A_ok[:, None, None], A, jnp.eye(2)))
    max_level = len(cur_pyr) - 1
    slevel = matcher_ops.best_search_level(A, max_level)
    # long-band coverage (reference parity, matcher.cpp:347-356): the
    # reference walks the WHOLE [d_min, d_max] band and gives up past
    # max_epi_search_steps — it never searches a prefix. Here a band longer
    # than the n_epi_steps window bumps the search to a coarser pyramid
    # level (each level halves the band) until it fits; bands that exceed
    # the window even at the coarsest level fail the match and take the
    # reference's outlier penalty (depth_filter.cpp:311-317 b++), never a
    # wrong-prefix measurement.
    def _proj0(xyz):
        z = jnp.maximum(xyz[:, 2], 1e-6)
        return jnp.stack([fx * xyz[:, 0] / z + cx,
                          fy * xyz[:, 1] / z + cy], -1)

    band0 = jnp.linalg.norm(_proj0(xyz_near) - _proj0(xyz_far), axis=-1)
    band_lvl = band0 / (1 << slevel).astype(f32)
    extra = jnp.ceil(jnp.log2(jnp.maximum(band_lvl / n_epi_steps, 1.0)))
    slevel = jnp.minimum(slevel + extra.astype(jnp.int32), max_level)
    too_long = band0 / (1 << slevel).astype(f32) > f32(n_epi_steps)
    from plsvo_tpu.image import ensure_flat_atlas, pack_pyramid_atlas

    kf_flat = ensure_flat_atlas(kf_pyr_stack)
    cur_atlas, cxo, cso = pack_pyramid_atlas(cur_pyr)
    patches_b, warp_ok = matcher_ops.warp_patches_affine_atlas(
        kf_flat, seeds.kf_idx, seeds.uv, seeds.level, A_inv, slevel,
        patch_size=patch_size)
    ref_patch, ref_dx, ref_dy = ref_patch_gradients(patches_b, patch_size)

    search_valid = visible & warp_ok & A_ok & ~too_long \
        & (xyz_far[:, 2] > 1e-3) & (xyz_near[:, 2] > 1e-3)

    skipped = jnp.zeros((S,), bool)
    if max_search:
        # the budget path must be taken whenever the feature is enabled —
        # NOT only when max_search < S — so results are invariant to the
        # processed table width: the live-prefix width differs between
        # sequential and pipelined execution and must not change which
        # code path a given seed's update takes.
        k_search = min(max_search, S)
        # band length in px at the (possibly bumped) search level
        band = band0 / (1 << slevel).astype(f32)
        band = jnp.where(search_valid, band, -1.0)
        is_short = search_valid & (band <= 2.0)
        # budget priority: longest bands first, DIVIDED by accumulated
        # failures (b grows by 1 per failed search) — a seed that keeps
        # failing cannot monopolize the budget, so every searchable seed
        # is reached within a bounded number of frames even when the top
        # band-length order is static (starvation bound, VERDICT r2 #5)
        fail_w = 1.0 + jnp.maximum(seeds.b - 10.0, 0.0)
        long_key = jnp.where(is_short, -1.0, band / fail_w)
        _, idx_long = jax.lax.top_k(long_key, k_search)
        sub = lambda a: a[idx_long]
        epi_sub = matcher_ops.epipolar_search_sliding_atlas(
            cur_atlas, cxo, cso, sub(patches_b), sub(xyz_far),
            sub(xyz_near), sub(slevel), sub(search_valid) & ~sub(is_short),
            fx, fy, cx, cy, patch_size=patch_size, n_steps=n_epi_steps)
        # short path: align directly from the mean-depth projection
        uv_level0 = uv_cur * (1.0 / (1 << slevel).astype(f32))[:, None]
        epi_uv = uv_level0.at[idx_long].set(
            jnp.where(epi_sub.ok[:, None], epi_sub.uv_level,
                      uv_level0[idx_long]))
        searched = jnp.zeros((S,), bool).at[idx_long].set(
            sub(search_valid) & ~sub(is_short))
        epi_ok = is_short | (jnp.zeros((S,), bool).at[idx_long].set(
            epi_sub.ok))
        # long-band seeds that did not fit the search budget: skip silently
        skipped = search_valid & ~is_short & ~searched
        epi = matcher_ops.EpipolarResult(
            uv_level=epi_uv, zmssd=jnp.zeros((S,), f32),
            ok=epi_ok & ~skipped)
    else:
        epi = matcher_ops.epipolar_search_sliding_atlas(
            cur_atlas, cxo, cso, patches_b, xyz_far, xyz_near, slevel,
            search_valid, fx, fy, cx, cy, patch_size=patch_size,
            n_steps=n_epi_steps)

    # subpixel refinement at the search level, then triangulate.
    # 1-D patches (edgelets / points on straight edges): align2D's Hessian
    # is singular along the edge, so those refine with align1D along the
    # EPIPOLAR direction instead (the reference's options_.align_1d path,
    # matcher.cpp:326-334/397-404), and edge-parallel-to-epipolar seeds are
    # rejected outright with the outlier penalty (edgelet filtering,
    # matcher.cpp:303-311, |cos| < 0.7). The 1-D test is data-driven from
    # the warped patch's structure tensor — it needs no feature-type column
    # and also covers line-endpoint seeds lying on straight lines.
    from plsvo_tpu.ops.feature_align import align_mixed_atlas

    gxx = jnp.sum(ref_dx * ref_dx, -1)
    gxy = jnp.sum(ref_dx * ref_dy, -1)
    gyy = jnp.sum(ref_dy * ref_dy, -1)
    tr = gxx + gyy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * (gxx * gyy - gxy * gxy),
                                0.0))
    eig_max = 0.5 * (tr + disc)
    eig_min = 0.5 * (tr - disc)
    is_1d = eig_min < 0.05 * jnp.maximum(eig_max, 1e-12)
    # dominant gradient direction = eigenvector of the max eigenvalue
    gdir = jnp.stack([gxy, eig_max - gxx], -1)
    alt = jnp.stack([eig_max - gyy, gxy], -1)
    use_alt = jnp.linalg.norm(gdir, axis=-1) < 1e-8
    gdir = jnp.where(use_alt[:, None], alt, gdir)
    gdir = gdir / jnp.maximum(
        jnp.linalg.norm(gdir, axis=-1, keepdims=True), 1e-12)
    d_epi = _proj0(xyz_near) - _proj0(xyz_far)
    d_epi = d_epi / jnp.maximum(
        jnp.linalg.norm(d_epi, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.abs(jnp.sum(gdir * d_epi, -1))
    edge_reject = is_1d & (cosang < 0.7)
    ok_ref = epi.ok & ~edge_reject

    res = align_mixed_atlas(
        cur_atlas, cxo, cso, ref_patch, ref_dx, ref_dy, epi.uv_level,
        d_epi, is_1d, slevel, ok_ref, patch_size=patch_size, n_iter=10)
    scale_back = (1 << slevel).astype(f32)
    uv0 = res.uv * scale_back[:, None]
    matched = ok_ref & res.converged

    # bearing of the refined match in the CUR frame
    x_n = (uv0[:, 0] - cx) / fx
    y_n = (uv0[:, 1] - cy) / fy
    f_cur = jnp.stack([x_n, y_n, jnp.ones_like(x_n)], -1)
    f_cur = f_cur / jnp.linalg.norm(f_cur, axis=-1, keepdims=True)
    d_ref, d_cur, tri_ok = matcher_ops.triangulate_depth(R_cr, t_cr, seeds.f, f_cur)
    matched = matched & tri_ok & (d_ref > 1e-6)

    # tau in inverse-depth space (depth_filter.cpp:319-321)
    px_error_angle = jnp.arctan(1.0 / (2.0 * fx)) * 2.0
    R_rc, t_rc = (jnp.swapaxes(R_cr, -1, -2),
                  -jnp.einsum("sji,sj->si", R_cr, t_cr))
    tau = compute_tau(t_rc, seeds.f, d_ref, px_error_angle)
    tau_inv = 0.5 * (1.0 / jnp.maximum(d_ref - tau, 1e-7)
                     - 1.0 / jnp.maximum(d_ref + tau, 1e-7))
    x_meas = 1.0 / jnp.maximum(d_ref, 1e-10)

    mu_n, s2_n, a_n, b_n, upd_ok = bayes_update(
        x_meas, tau_inv * tau_inv, seeds.mu, seeds.sigma2, seeds.a, seeds.b,
        seeds.z_range)
    do_upd = matched & upd_ok
    mu = jnp.where(do_upd, mu_n, seeds.mu)
    sigma2 = jnp.where(do_upd, s2_n, seeds.sigma2)
    a_new = jnp.where(do_upd, a_n, seeds.a)
    # failed visible search counts as an outlier observation (b += 1);
    # budget-skipped seeds are not penalized (no search was attempted)
    b_new = jnp.where(do_upd, b_n,
                      jnp.where(visible & ~matched & ~skipped,
                                seeds.b + 1.0, seeds.b))

    converged = alive & (jnp.sqrt(jnp.maximum(sigma2, 0.0))
                         < seeds.z_range / sigma_conv_factor)
    # kill diverged/NaN seeds
    dead = ~jnp.isfinite(mu) | ~jnp.isfinite(sigma2) | (mu < 0)
    alive_out = alive & ~dead & ~converged

    new_seeds = seeds._replace(
        mu=mu, sigma2=sigma2, a=a_new, b=b_new, alive=alive_out)
    return SeedUpdateResult(
        seeds=new_seeds, converged=converged, matched=matched,
        depth_converged=1.0 / jnp.maximum(mu, 1e-10),
        skipped=skipped)


@partial(jax.jit, static_argnames=("patch_size", "n_epi_steps", "max_seed_kfs",
                                   "sigma_conv_factor"))
def update_point_seeds_bucketed(
    full: PointSeeds,
    rows: jnp.ndarray,  # (B,) full-table rows to process (padded)
    pad_alive: jnp.ndarray,  # (B,) bool, False on padding rows
    kf_R_w, kf_t_w, kf_pyr_stack, cur_pyr, R_w_cur, t_w_cur,
    fx, fy, cx, cy, batch_counter,
    *,
    patch_size: int = 8,
    n_epi_steps: int = 64,
    max_seed_kfs: int = 3,
    sigma_conv_factor: float = 200.0,
):
    """update_point_seeds on a compacted bucket of rows, with the
    view-extract and scatter-back fused into the same dispatch (the staged
    path paid ~16 eager op launches per frame for these).

    Returns (updated_full_table, SeedUpdateResult in bucket space)."""
    view = jax.tree.map(lambda a: a[rows], full)
    view = view._replace(alive=view.alive & pad_alive)
    res = update_point_seeds(
        view, kf_R_w, kf_t_w, kf_pyr_stack, cur_pyr, R_w_cur, t_w_cur,
        fx, fy, cx, cy, batch_counter, patch_size=patch_size,
        n_epi_steps=n_epi_steps, max_seed_kfs=max_seed_kfs,
        sigma_conv_factor=sigma_conv_factor)
    ns = res.seeds
    # scatter only where not padding (padding rows are all row 0 duplicates)
    r = jnp.where(pad_alive, rows, full.mu.shape[0])  # OOB drop for padding
    new_full = full._replace(
        mu=full.mu.at[r].set(ns.mu, mode="drop"),
        sigma2=full.sigma2.at[r].set(ns.sigma2, mode="drop"),
        a=full.a.at[r].set(ns.a, mode="drop"),
        b=full.b.at[r].set(ns.b, mode="drop"),
        alive=full.alive.at[r].set(ns.alive, mode="drop"))
    return new_full, res


@partial(jax.jit, static_argnames=("patch_size", "n_epi_steps", "max_seed_kfs",
                                   "sigma_conv_factor"))
def update_line_seeds_bucketed(
    full: LineSeeds,
    rows: jnp.ndarray,
    pad_alive: jnp.ndarray,
    kf_R_w, kf_t_w, kf_pyr_stack, cur_pyr, R_w_cur, t_w_cur,
    fx, fy, cx, cy, batch_counter,
    *,
    patch_size: int = 8,
    n_epi_steps: int = 64,
    max_seed_kfs: int = 3,
    sigma_conv_factor: float = 200.0,
):
    """update_line_seeds on a compacted bucket (see
    update_point_seeds_bucketed)."""
    view = jax.tree.map(lambda a: a[rows], full)
    view = view._replace(alive=view.alive & pad_alive)
    res = update_line_seeds(
        view, kf_R_w, kf_t_w, kf_pyr_stack, cur_pyr, R_w_cur, t_w_cur,
        fx, fy, cx, cy, batch_counter, patch_size=patch_size,
        n_epi_steps=n_epi_steps, max_seed_kfs=max_seed_kfs,
        sigma_conv_factor=sigma_conv_factor)
    ns = res.seeds
    r = jnp.where(pad_alive, rows, full.mu_s.shape[0])
    new_full = full._replace(
        mu_s=full.mu_s.at[r].set(ns.mu_s, mode="drop"),
        sigma2_s=full.sigma2_s.at[r].set(ns.sigma2_s, mode="drop"),
        mu_e=full.mu_e.at[r].set(ns.mu_e, mode="drop"),
        sigma2_e=full.sigma2_e.at[r].set(ns.sigma2_e, mode="drop"),
        a=full.a.at[r].set(ns.a, mode="drop"),
        b=full.b.at[r].set(ns.b, mode="drop"),
        alive=full.alive.at[r].set(ns.alive, mode="drop"))
    return new_full, res


@partial(jax.jit, static_argnames=("B",))
def scatter_new_point_seeds_blob(full: "PointSeeds", blob: jnp.ndarray,
                                 *, B: int) -> "PointSeeds":
    """scatter_new_point_seeds with ALL inputs in ONE packed f32 upload.

    The unpacked variant paid ~7 separate host->device transfers per call
    (~0.8 ms tunnel launch latency EACH); keyframes in the batched runner
    make this per-sequence. Blob layout (f32, built by
    FrameHandlerMono._complete_seed_init): rows(B) mask(B) kf(B) uv(B,2)
    f(B,3) level(B) mu sigma2 z_range batch_id."""
    o = 0

    def take(n):
        nonlocal o
        a = jax.lax.dynamic_slice_in_dim(blob, o, n)
        o += n
        return a

    rows = take(B).astype(jnp.int32)
    mask = take(B) > 0.5
    kf_idx = take(B).astype(jnp.int32)
    uv = take(2 * B).reshape(B, 2)
    f = take(3 * B).reshape(B, 3)
    level = take(B).astype(jnp.int32)
    mu = take(1)[0]
    sigma2 = take(1)[0]
    z_range = take(1)[0]
    batch_id = take(1)[0].astype(jnp.int32)
    return scatter_new_point_seeds(full, rows, mask, kf_idx, uv, f, level,
                                   mu, sigma2, z_range, batch_id)


@partial(jax.jit, static_argnames=("B",))
def scatter_new_line_seeds_blob(full: "LineSeeds", blob: jnp.ndarray,
                                *, B: int) -> "LineSeeds":
    """One-upload variant of scatter_new_line_seeds. Blob layout:
    rows(B) mask(B) kf(B) s_uv(B,2) e_uv(B,2) sf(B,3) ef(B,3) level(B)
    mu sigma2 z_range batch_id."""
    o = 0

    def take(n):
        nonlocal o
        a = jax.lax.dynamic_slice_in_dim(blob, o, n)
        o += n
        return a

    rows = take(B).astype(jnp.int32)
    mask = take(B) > 0.5
    kf_idx = take(B).astype(jnp.int32)
    s_uv = take(2 * B).reshape(B, 2)
    e_uv = take(2 * B).reshape(B, 2)
    sf = take(3 * B).reshape(B, 3)
    ef = take(3 * B).reshape(B, 3)
    level = take(B).astype(jnp.int32)
    mu = take(1)[0]
    sigma2 = take(1)[0]
    z_range = take(1)[0]
    batch_id = take(1)[0].astype(jnp.int32)
    return scatter_new_line_seeds(full, rows, mask, kf_idx, s_uv, e_uv,
                                  sf, ef, level, mu, sigma2, z_range,
                                  batch_id)


@jax.jit
def scatter_new_point_seeds(
    full: PointSeeds,
    rows: jnp.ndarray,  # (B,) target rows (padded; mask selects real ones)
    mask: jnp.ndarray,  # (B,) bool
    kf_idx, uv, f, level,  # (B,...) new static columns
    mu, sigma2, z_range, batch_id,  # () scalars for all new seeds
) -> PointSeeds:
    """Install new seeds into free rows ON DEVICE (one dispatch) — replaces
    the fetch-rebuild-upload the staged path did per keyframe
    (reference: DepthFilter::initializeSeeds, depth_filter.cpp:151-197)."""
    S = full.mu.shape[0]
    r = jnp.where(mask, rows, S)  # OOB -> dropped
    bshape = rows.shape
    return full._replace(
        kf_idx=full.kf_idx.at[r].set(kf_idx, mode="drop"),
        uv=full.uv.at[r].set(uv, mode="drop"),
        f=full.f.at[r].set(f, mode="drop"),
        level=full.level.at[r].set(level, mode="drop"),
        mu=full.mu.at[r].set(jnp.full(bshape, mu), mode="drop"),
        sigma2=full.sigma2.at[r].set(jnp.full(bshape, sigma2), mode="drop"),
        z_range=full.z_range.at[r].set(jnp.full(bshape, z_range), mode="drop"),
        a=full.a.at[r].set(jnp.full(bshape, 10.0), mode="drop"),
        b=full.b.at[r].set(jnp.full(bshape, 10.0), mode="drop"),
        batch_id=full.batch_id.at[r].set(
            jnp.full(bshape, batch_id, jnp.int32), mode="drop"),
        alive=full.alive.at[r].set(mask, mode="drop"))


@jax.jit
def scatter_new_line_seeds(
    full: LineSeeds,
    rows: jnp.ndarray,
    mask: jnp.ndarray,
    kf_idx, s_uv, e_uv, sf, ef, level,
    mu, sigma2, z_range, batch_id,
) -> LineSeeds:
    """Line-seed analogue of scatter_new_point_seeds (both endpoints get
    the same inverse-depth prior, depth_filter.cpp:63-74)."""
    S = full.mu_s.shape[0]
    r = jnp.where(mask, rows, S)
    bshape = rows.shape
    fmu = jnp.full(bshape, mu)
    fs2 = jnp.full(bshape, sigma2)
    fzr = jnp.full(bshape, z_range)
    return full._replace(
        kf_idx=full.kf_idx.at[r].set(kf_idx, mode="drop"),
        s_uv=full.s_uv.at[r].set(s_uv, mode="drop"),
        e_uv=full.e_uv.at[r].set(e_uv, mode="drop"),
        sf=full.sf.at[r].set(sf, mode="drop"),
        ef=full.ef.at[r].set(ef, mode="drop"),
        level=full.level.at[r].set(level, mode="drop"),
        mu_s=full.mu_s.at[r].set(fmu, mode="drop"),
        sigma2_s=full.sigma2_s.at[r].set(fs2, mode="drop"),
        z_range_s=full.z_range_s.at[r].set(fzr, mode="drop"),
        mu_e=full.mu_e.at[r].set(fmu, mode="drop"),
        sigma2_e=full.sigma2_e.at[r].set(fs2, mode="drop"),
        z_range_e=full.z_range_e.at[r].set(fzr, mode="drop"),
        a=full.a.at[r].set(jnp.full(bshape, 10.0), mode="drop"),
        b=full.b.at[r].set(jnp.full(bshape, 10.0), mode="drop"),
        batch_id=full.batch_id.at[r].set(
            jnp.full(bshape, batch_id, jnp.int32), mode="drop"),
        alive=full.alive.at[r].set(mask, mode="drop"))


class LineSeedUpdateResult(NamedTuple):
    seeds: LineSeeds
    converged: jnp.ndarray  # (S,)
    matched: jnp.ndarray  # (S,) both endpoints matched
    depth_s: jnp.ndarray  # (S,) converged start-endpoint depths (1/mu_s)
    depth_e: jnp.ndarray
    skipped: jnp.ndarray = jnp.zeros((0,), bool)  # (S,) either endpoint starved


def _line_endpoint_view(seeds: LineSeeds, start: bool) -> PointSeeds:
    return PointSeeds(
        kf_idx=seeds.kf_idx,
        uv=seeds.s_uv if start else seeds.e_uv,
        f=seeds.sf if start else seeds.ef,
        level=seeds.level,
        mu=seeds.mu_s if start else seeds.mu_e,
        sigma2=seeds.sigma2_s if start else seeds.sigma2_e,
        z_range=seeds.z_range_s if start else seeds.z_range_e,
        a=seeds.a, b=seeds.b,
        batch_id=seeds.batch_id, alive=seeds.alive)


@partial(jax.jit, static_argnames=("patch_size", "n_epi_steps", "max_seed_kfs",
                                   "sigma_conv_factor"))
def update_line_seeds(
    seeds: LineSeeds,
    kf_R_w: jnp.ndarray, kf_t_w: jnp.ndarray,
    kf_pyr_stack: Sequence[jnp.ndarray],
    cur_pyr: Sequence[jnp.ndarray],
    R_w_cur: jnp.ndarray, t_w_cur: jnp.ndarray,
    fx, fy, cx, cy,
    batch_counter: jnp.ndarray,
    *,
    patch_size: int = 8,
    n_epi_steps: int = 64,
    max_seed_kfs: int = 3,
    sigma_conv_factor: float = 200.0,
) -> LineSeedUpdateResult:
    """Line seeds: both endpoints run the point-seed machinery
    (findEpipolarMatchDirectSegmentEndpoint analogue, matcher.cpp:422-586);
    the shared Beta parameters fuse as a=max(a_s,a_e), b=min(b_s,b_e)
    (reference: updateLineSeed, depth_filter.cpp:557-566)."""
    kw = dict(patch_size=patch_size, n_epi_steps=n_epi_steps,
              max_seed_kfs=max_seed_kfs, sigma_conv_factor=sigma_conv_factor)
    rs = update_point_seeds(
        _line_endpoint_view(seeds, True), kf_R_w, kf_t_w, kf_pyr_stack,
        cur_pyr, R_w_cur, t_w_cur, fx, fy, cx, cy, batch_counter, **kw)
    re_ = update_point_seeds(
        _line_endpoint_view(seeds, False), kf_R_w, kf_t_w, kf_pyr_stack,
        cur_pyr, R_w_cur, t_w_cur, fx, fy, cx, cy, batch_counter, **kw)
    return _combine_line_endpoint_results(
        seeds, rs, re_, batch_counter, max_seed_kfs, sigma_conv_factor)


def _combine_line_endpoint_results(
    seeds: LineSeeds, rs: SeedUpdateResult, re_: SeedUpdateResult,
    batch_counter, max_seed_kfs: int, sigma_conv_factor: float,
) -> LineSeedUpdateResult:
    """Fuse two endpoint SeedUpdateResults into the line-seed update
    (reference: updateLineSeed, depth_filter.cpp:514-566)."""
    both = rs.matched & re_.matched
    # apply endpoint updates only when BOTH endpoints matched (the reference
    # updates jointly in updateLineSeed, depth_filter.cpp:406-430)
    mu_s = jnp.where(both, rs.seeds.mu, seeds.mu_s)
    s2_s = jnp.where(both, rs.seeds.sigma2, seeds.sigma2_s)
    mu_e = jnp.where(both, re_.seeds.mu, seeds.mu_e)
    s2_e = jnp.where(both, re_.seeds.sigma2, seeds.sigma2_e)
    a = jnp.where(both, jnp.maximum(rs.seeds.a, re_.seeds.a), seeds.a)
    b = jnp.where(both, jnp.minimum(rs.seeds.b, re_.seeds.b),
                  jnp.where(rs.matched | re_.matched, seeds.b,
                            jnp.where(seeds.alive, seeds.b + 1.0, seeds.b)))
    sig_s = jnp.sqrt(jnp.maximum(s2_s, 0.0))
    sig_e = jnp.sqrt(jnp.maximum(s2_e, 0.0))
    converged = seeds.alive & (sig_s < seeds.z_range_s / sigma_conv_factor) \
        & (sig_e < seeds.z_range_e / sigma_conv_factor)
    aged = (batch_counter - seeds.batch_id) > max_seed_kfs
    dead = ~jnp.isfinite(mu_s) | ~jnp.isfinite(mu_e) | (mu_s < 0) | (mu_e < 0) | aged
    alive_out = seeds.alive & ~dead & ~converged
    new_seeds = seeds._replace(
        mu_s=mu_s, sigma2_s=s2_s, mu_e=mu_e, sigma2_e=s2_e, a=a, b=b,
        alive=alive_out)
    return LineSeedUpdateResult(
        seeds=new_seeds, converged=converged, matched=both,
        depth_s=1.0 / jnp.maximum(mu_s, 1e-10),
        depth_e=1.0 / jnp.maximum(mu_e, 1e-10),
        skipped=rs.skipped | re_.skipped)


def _seed_work_priority(seeds: PointSeeds, kf_R_w, kf_t_w, img_shape,
                        max_level, R_w_cur, t_w_cur, fx, fy, cx, cy,
                        batch_counter, *, patch_size, n_epi_steps,
                        max_seed_kfs):
    """Cheap (elementwise) work priority per seed for the device-side
    work-set compaction: visible seeds rank by epipolar-band class —
    short-band seeds (direct align, the reference's matcher.cpp:325-345
    path) above long-band ones, both rotated by accumulated failures so no
    seed starves (same fail_w policy as the search budget). <= 0 means the
    row does no useful work this frame."""
    f32 = jnp.float32
    alive = seeds.alive & ((batch_counter - seeds.batch_id) <= max_seed_kfs)
    R_kf = kf_R_w[seeds.kf_idx]
    t_kf = kf_t_w[seeds.kf_idx]
    R_cw, t_cw = lie.inverse(R_w_cur, t_w_cur)
    R_cr = jnp.einsum("ij,sjk->sik", R_cw, R_kf)
    t_cr = jnp.einsum("ij,sj->si", R_cw, t_kf) + t_cw
    depth = 1.0 / jnp.maximum(seeds.mu, 1e-10)
    xyz_cur = jnp.einsum("sij,sj->si", R_cr, seeds.f * depth[:, None]) + t_cr
    z_ok = xyz_cur[:, 2] > 0.1
    uv_cur = jnp.stack([
        fx * xyz_cur[:, 0] / jnp.maximum(xyz_cur[:, 2], 1e-6) + cx,
        fy * xyz_cur[:, 1] / jnp.maximum(xyz_cur[:, 2], 1e-6) + cy], -1)
    H0, W0 = img_shape
    margin = patch_size
    in_frame = ((uv_cur[:, 0] > margin) & (uv_cur[:, 0] < W0 - margin)
                & (uv_cur[:, 1] > margin) & (uv_cur[:, 1] < H0 - margin))
    visible = alive & z_ok & in_frame
    sigma = jnp.sqrt(jnp.maximum(seeds.sigma2, 0.0))
    d_max = 1.0 / jnp.maximum(seeds.mu - sigma, 1e-7)
    d_min = 1.0 / (seeds.mu + sigma)
    xyz_far = jnp.einsum("sij,sj->si", R_cr, seeds.f * d_max[:, None]) + t_cr
    xyz_near = jnp.einsum("sij,sj->si", R_cr, seeds.f * d_min[:, None]) + t_cr

    def _proj0(xyz):
        z = jnp.maximum(xyz[:, 2], 1e-6)
        return jnp.stack([fx * xyz[:, 0] / z + cx,
                          fy * xyz[:, 1] / z + cy], -1)

    band0 = jnp.linalg.norm(_proj0(xyz_near) - _proj0(xyz_far), axis=-1)
    # approximate search level by band length alone (the exact level also
    # folds the affine warp determinant; a selected-but-unsearchable row
    # just wastes a slot, which is harmless)
    lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(
        band0 / n_epi_steps, 1.0))).astype(jnp.int32), 0, max_level)
    band = band0 / (1 << lvl).astype(f32)
    is_short = band <= 2.0
    fail_w = 1.0 + jnp.maximum(seeds.b - 10.0, 0.0)
    prio = jnp.where(is_short, 1e3 + 1e3 / fail_w, band / fail_w)
    return jnp.where(visible, prio, -1.0)


@partial(jax.jit, static_argnames=("patch_size", "n_epi_steps",
                                   "max_seed_kfs", "sigma_conv_factor",
                                   "has_pt", "has_ln", "max_search",
                                   "pt_work"))
def update_seeds_combined(
    pt_seeds,  # PointSeeds view (live prefix) or None
    ln_seeds,  # LineSeeds view or None
    kf_R_w, kf_t_w, kf_pyr_stack, cur_pyr, R_w_cur, t_w_cur,
    fx, fy, cx, cy, batch_counter,
    *,
    has_pt: bool,
    has_ln: bool,
    patch_size: int = 8,
    n_epi_steps: int = 64,
    max_seed_kfs: int = 3,
    sigma_conv_factor: float = 200.0,
    max_search: int = 0,
    pt_work: int = 0,
):
    """Point seeds + both line-seed endpoints through ONE epipolar/align
    pipeline: the three per-kind update_point_seeds calls each pay the full
    chain of warp + sliding-window search + align2d while-loop kernels;
    concatenating the row sets amortizes those fixed costs over one batch
    (the math per row is identical — update_point_seeds is row-wise).

    pt_work > 0: device-side WORK-SET compaction of the point portion —
    only the pt_work highest-priority point seeds (see _seed_work_priority)
    run the expensive warp/search/align chain; the rest are carried
    untouched this frame (aging still applies). The warp gather and the
    align GN loop scale with processed rows, and mid-sequence live counts
    (~400+) far exceed the useful per-frame work set.

    Returns (SeedUpdateResult | None, LineSeedUpdateResult | None) in the
    same row spaces as the input views."""
    parts = []
    pt_idx = None
    Wp_full = 0
    if has_pt:
        Wp_full = pt_seeds.mu.shape[0]
        if pt_work and pt_work < Wp_full:
            prio = _seed_work_priority(
                pt_seeds, kf_R_w, kf_t_w, cur_pyr[0].shape,
                len(cur_pyr) - 1, R_w_cur, t_w_cur, fx, fy, cx, cy,
                batch_counter, patch_size=patch_size,
                n_epi_steps=n_epi_steps, max_seed_kfs=max_seed_kfs)
            p_sel, pt_idx = jax.lax.top_k(prio, pt_work)
            pt_sub = jax.tree.map(lambda a: a[pt_idx], pt_seeds)
            parts.append(pt_sub)
        else:
            parts.append(pt_seeds)
    if has_ln:
        parts.append(_line_endpoint_view(ln_seeds, True))
        parts.append(_line_endpoint_view(ln_seeds, False))
    combined = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
    res = update_point_seeds(
        combined, kf_R_w, kf_t_w, kf_pyr_stack, cur_pyr, R_w_cur, t_w_cur,
        fx, fy, cx, cy, batch_counter, patch_size=patch_size,
        n_epi_steps=n_epi_steps, max_seed_kfs=max_seed_kfs,
        sigma_conv_factor=sigma_conv_factor, max_search=max_search)
    off = 0
    pt_res = None
    if has_pt:
        if pt_idx is not None:
            Wk = pt_work
            sub_res = jax.tree.map(lambda a: a[:Wk], res)
            # scatter the worked rows back into the full row space;
            # unselected rows: carried values + aging, no penalty (like
            # budget-skipped seeds), not converged/matched this frame
            aged = (batch_counter - pt_seeds.batch_id) > max_seed_kfs
            base = pt_seeds._replace(alive=pt_seeds.alive & ~aged)
            worked = p_sel > 0.0
            idx_w = jnp.where(worked, pt_idx, Wp_full)  # OOB -> drop

            def scat(full_col, new_col):
                return full_col.at[idx_w].set(new_col, mode="drop")

            seeds_out = jax.tree.map(scat, base, sub_res.seeds)
            zb = jnp.zeros(Wp_full, bool)
            zf = jnp.zeros(Wp_full, jnp.float32)
            pt_res = SeedUpdateResult(
                seeds=seeds_out,
                converged=zb.at[idx_w].set(sub_res.converged, mode="drop"),
                matched=zb.at[idx_w].set(sub_res.matched, mode="drop"),
                depth_converged=zf.at[idx_w].set(sub_res.depth_converged,
                                                 mode="drop"),
                skipped=zb.at[idx_w].set(sub_res.skipped, mode="drop"))
            off = Wk
        else:
            Wp = pt_seeds.mu.shape[0]
            pt_res = jax.tree.map(lambda a: a[:Wp], res)
            off = Wp
    ln_res = None
    if has_ln:
        Wl = ln_seeds.mu_s.shape[0]
        rs = jax.tree.map(lambda a: a[off:off + Wl], res)
        re_ = jax.tree.map(lambda a: a[off + Wl:off + 2 * Wl], res)
        ln_res = _combine_line_endpoint_results(
            ln_seeds, rs, re_, batch_counter, max_seed_kfs,
            sigma_conv_factor)
    return pt_res, ln_res
