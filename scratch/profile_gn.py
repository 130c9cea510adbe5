"""Split GN-loop cost from gather cost in the three hot chains:
sparse_align (iteration slope), find_match_direct_atlas (align loop vs
warp), seed update (epipolar search vs align). Slope method as in
profile_stages2."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config
from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono
from plsvo_tpu.ops import sparse_align
from plsvo_tpu.image import build_pyramid

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = jnp.asarray(np.load("/root/repo/.bench_frames.npz")["imgs"])[:30]

cfg = Config()
vo = FrameHandlerMono(cam, cfg)
for i in range(24):
    vo.add_image(imgs[i], i / 30.0)
pl_ = cfg.pipeline
caps = cfg.caps
pyr = tuple(build_pyramid(imgs[25], vo.n_levels))
last = vo.last_frame
blob = None
from plsvo_tpu.pipeline import fused
blobv = fused.unpack_blob(vo._last_blob(last), vo._blob_specs())
lt = fused.LastFrameTables(*blobv[:11])
fxj, fyj, cxj, cyj = cam.fx, cam.fy, cam.cx, cam.cy


def perturb(tree, eps):
    return jax.tree.map(
        lambda a: a + eps if (hasattr(a, "dtype")
                              and jnp.issubdtype(a.dtype, jnp.floating))
        else a, tree)


def scanify(stage_fn, iters):
    @jax.jit
    def run():
        def body(carry, _):
            eps = carry
            out = stage_fn(eps)
            leaves = [l for l in jax.tree.leaves(out)
                      if hasattr(l, "dtype")
                      and jnp.issubdtype(l.dtype, jnp.floating)]
            s = sum(jnp.sum(l) for l in leaves)
            return eps + s * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c
    return run


def slope(stage_fn, n=4):
    r50 = scanify(stage_fn, 24)
    r500 = scanify(stage_fn, 120)
    jax.block_until_ready(r50())
    jax.block_until_ready(r500())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(r50())
    t50 = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(r500())
    t500 = (time.perf_counter() - t0) / n
    return (t500 - t50) / (120 - 24) * 1e3


lv = tuple(range(pl_.klt_max_level, pl_.klt_min_level - 1, -1))


def mk_align(n_iter):
    def f(eps):
        lt_p = perturb(lt, eps)
        pts_in = sparse_align.AlignPoints(
            xyz_ref=lt_p.pt_f * lt_p.pt_depth[:, None],
            uv_ref=lt_p.pt_uv, valid=lt_p.pt_valid)
        segs_in = sparse_align.make_align_segments(
            lt_p.seg_suv, lt_p.seg_euv, lt_p.seg_sf, lt_p.seg_ef,
            lt_p.seg_sdepth, lt_p.seg_edepth, lt_p.seg_valid,
            n_samples=caps.n_line_samples, fx=fxj, fy=fyj, cx=cxj, cy=cyj)
        return sparse_align.sparse_img_align(
            perturb(last.pyr, eps), perturb(pyr, eps), pts_in, segs_in,
            jnp.eye(3), jnp.zeros(3), fxj, fyj, cxj, cyj, levels=lv,
            n_iter=n_iter, patch_size=pl_.img_align_patch_size)
    return f


# iteration slope of the align (the while_loop early-exits; force more
# iterations by lowering eps? -> instead compare n_iter=1 (precompute+1 iter)
# vs the default (data-dependent). ALSO time 1-level variants.
print(f"sparse_align n_iter=30 (dflt): {slope(mk_align(30)):7.2f} ms", flush=True)
print(f"sparse_align n_iter=1       : {slope(mk_align(1)):7.2f} ms", flush=True)


def mk_align_1lvl(level, n_iter=30):
    def f(eps):
        lt_p = perturb(lt, eps)
        pts_in = sparse_align.AlignPoints(
            xyz_ref=lt_p.pt_f * lt_p.pt_depth[:, None],
            uv_ref=lt_p.pt_uv, valid=lt_p.pt_valid)
        segs_in = sparse_align.make_align_segments(
            lt_p.seg_suv, lt_p.seg_euv, lt_p.seg_sf, lt_p.seg_ef,
            lt_p.seg_sdepth, lt_p.seg_edepth, lt_p.seg_valid,
            n_samples=caps.n_line_samples, fx=fxj, fy=fyj, cx=cxj, cy=cyj)
        return sparse_align.sparse_img_align(
            perturb(last.pyr, eps), perturb(pyr, eps), pts_in, segs_in,
            jnp.eye(3), jnp.zeros(3), fxj, fyj, cxj, cyj, levels=(level,),
            n_iter=n_iter, patch_size=pl_.img_align_patch_size)
    return f


print(f"sparse_align 1 level (L2)   : {slope(mk_align_1lvl(2)):7.2f} ms", flush=True)

# ---- find_match_direct_atlas: full vs n_iter=1 ----
from plsvo_tpu.ops import matcher as matcher_ops
from plsvo_tpu.pipeline import reprojector
from plsvo_tpu.image import pack_pyramid_atlas

mt = vo._map_tables()
kf_flat = vo.map.kf_atlas_flat(pl_.n_pyr_levels)
img_shape = pyr[0].shape
cur_sub = pyr[:pl_.n_pyr_levels]

lm_p, sel_p, ri_p = reprojector._select_points(
    mt.pt_pos, mt.pt_status, mt.pt_anchor_kf, mt.pt_anchor_uv,
    mt.pt_anchor_f, mt.pt_anchor_level, mt.pt_obs_kf, mt.pt_obs_uv,
    mt.pt_obs_f, mt.pt_obs_level, mt.kf_R, mt.kf_t, img_shape,
    jnp.asarray(last.R_f_w), jnp.asarray(last.t_f_w), fxj, fyj, cxj, cyj,
    cell_size=pl_.grid_size, max_out=caps.max_fts, patch_size=8,
    pt_anchor_type=mt.pt_anchor_type, pt_anchor_dir=mt.pt_anchor_dir)
lm_s, sel_s, ri_s, ri_e = reprojector._select_segments(
    mt.ln_spos, mt.ln_epos, mt.ln_status, mt.ln_anchor_kf,
    mt.ln_anchor_suv, mt.ln_anchor_euv, mt.ln_anchor_sf, mt.ln_anchor_ef,
    mt.ln_anchor_level, mt.kf_R, mt.kf_t, img_shape,
    jnp.asarray(last.R_f_w), jnp.asarray(last.t_f_w), fxj, fyj, cxj, cyj,
    cell_size=pl_.grid_size_segs, max_out=caps.max_segs, patch_size=8)
ri = jax.tree.map(lambda *xs: jnp.concatenate(xs), ri_p, ri_s, ri_e)
print("refine rows:", ri.valid.shape[0], "valid:", int(ri.valid.sum()),
      flush=True)


def mk_refine(n_iter):
    def f(eps):
        cur_atlas, cx_, cs = pack_pyramid_atlas(perturb(tuple(cur_sub), eps))
        ri_p_ = perturb(ri, eps)
        return matcher_ops.find_match_direct_atlas(
            perturb(kf_flat, eps), cur_atlas, cx_, cs,
            ri_p_.kf_idx, ri_p_.uv_ref, ri_p_.f_ref, ri_p_.depth_ref,
            ri_p_.level_ref, ri_p_.R_ca, ri_p_.t_ca, ri_p_.uv_init,
            ri_p_.valid, fxj, fyj, cxj, cyj, ri_p_.ftype, ri_p_.grad_dir,
            patch_size=8, n_iter=n_iter, max_level=len(cur_sub) - 1,
            has_edgelets=False)
    return f


print(f"find_match_direct n_iter=10 : {slope(mk_refine(10)):7.2f} ms", flush=True)
print(f"find_match_direct n_iter=1  : {slope(mk_refine(1)):7.2f} ms", flush=True)


# ---- warp patches alone ----
def mk_warp(eps):
    ri_p_ = perturb(ri, eps)
    A = jax.vmap(
        lambda uv, f, d, lvl, R, t: matcher_ops.get_warp_affine(
            fxj, fyj, cxj, cyj, uv[None], f[None], d[None], lvl[None], R, t)[0]
    )(ri_p_.uv_ref, ri_p_.f_ref, ri_p_.depth_ref, ri_p_.level_ref,
      ri_p_.R_ca, ri_p_.t_ca)
    A_inv = jnp.linalg.inv(A + jnp.eye(2) * 1e-3)
    slevel = matcher_ops.best_search_level(A, 2)
    return matcher_ops.warp_patches_affine_atlas(
        perturb(kf_flat, eps), ri_p_.kf_idx, ri_p_.uv_ref, ri_p_.level_ref,
        A_inv, slevel, patch_size=8)


print(f"warp_patches alone          : {slope(mk_warp):7.2f} ms", flush=True)

# ---- seed update: epipolar search alone vs align alone ----
from plsvo_tpu.ops import depth_filter as df

step_kwargs = vo._step_kwargs()
Wp = step_kwargs["pt_width"] or caps.max_seeds
Wl = step_kwargs["ln_width"] or caps.max_seed_segs
print(f"seed widths: pt={Wp} ln={Wl} budget={pl_.seed_search_budget}",
      flush=True)
sub_pt = jax.tree.map(lambda a: a[:Wp], vo.pt_seeds)
sub_ln = jax.tree.map(lambda a: a[:Wl], vo.ln_seeds)
R_w_kf = jnp.swapaxes(mt.kf_R, -1, -2)
t_w_kf = -jnp.einsum("kji,kj->ki", mt.kf_R, mt.kf_t)


def mk_seeds(budget, steps):
    def f(eps):
        return df.update_seeds_combined(
            perturb(sub_pt, eps), perturb(sub_ln, eps), R_w_kf, t_w_kf,
            perturb(kf_flat, eps), perturb(tuple(cur_sub), eps),
            perturb(jnp.asarray(last.R_f_w.T), eps),
            jnp.asarray(-last.R_f_w.T @ last.t_f_w),
            fxj, fyj, cxj, cyj, jnp.asarray(vo.batch_counter, jnp.int32),
            has_pt=True, has_ln=True, max_seed_kfs=pl_.max_seed_kfs,
            sigma_conv_factor=pl_.seed_convergence_sigma2_thresh,
            max_search=budget, n_epi_steps=steps)
    return f


print(f"seed upd budget=128 steps=64: {slope(mk_seeds(128, 64)):7.2f} ms",
      flush=True)
print(f"seed upd budget=32 steps=64 : {slope(mk_seeds(32, 64)):7.2f} ms",
      flush=True)
print(f"seed upd budget=128 steps=32: {slope(mk_seeds(128, 32)):7.2f} ms",
      flush=True)
