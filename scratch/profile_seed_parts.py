"""Decompose update_seeds_combined device time: warp, epipolar, align,
bayes+geometry — at production sizes."""
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
from plsvo_tpu.ops import depth_filter as df, matcher as matcher_ops
from plsvo_tpu.ops.feature_align import ref_patch_gradients, align_mixed_atlas
from plsvo_tpu.image import build_pyramid, ensure_flat_atlas, pack_pyramid_atlas
from plsvo_tpu import lie

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = jnp.asarray(np.load("/root/repo/.bench_frames.npz")["imgs"])[:30]
cfg = Config()
vo = FrameHandlerMono(cam, cfg)
for i in range(24):
    vo.add_image(imgs[i], i / 30.0)
pl_ = cfg.pipeline
pyr = tuple(build_pyramid(imgs[25], vo.n_levels))
mt = vo._map_tables()
kf_flat = vo.map.kf_atlas_flat(pl_.n_pyr_levels)
fxj, fyj, cxj, cyj = cam.fx, cam.fy, cam.cx, cam.cy
R_w_kf = jnp.swapaxes(mt.kf_R, -1, -2)
t_w_kf = -jnp.einsum("kji,kj->ki", mt.kf_R, mt.kf_t)
last = vo.last_frame
step_kwargs = vo._step_kwargs()
Wp = step_kwargs["pt_width"] or cfg.caps.max_seeds
Wl = step_kwargs["ln_width"] or cfg.caps.max_seed_segs
sub_pt = jax.tree.map(lambda a: a[:Wp], vo.pt_seeds)
sub_ln = jax.tree.map(lambda a: a[:Wl], vo.ln_seeds)
parts = [sub_pt, df._line_endpoint_view(sub_ln, True),
         df._line_endpoint_view(sub_ln, False)]
seeds = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
S = seeds.mu.shape[0]
print("combined rows:", S, flush=True)
cur_pyr = tuple(pyr[: pl_.n_pyr_levels])
R_w_cur = jnp.asarray(last.R_f_w.T)
t_w_cur = jnp.asarray(-last.R_f_w.T @ last.t_f_w)
bc = jnp.asarray(vo.batch_counter, jnp.int32)


def perturb(t, eps):
    return jax.tree.map(
        lambda a: a + eps if (hasattr(a, "dtype")
                              and jnp.issubdtype(a.dtype, jnp.floating))
        else a, t)


def scanify(fn, iters):
    @jax.jit
    def run():
        def body(c, _):
            out = fn(c)
            leaves = [l for l in jax.tree.leaves(out)
                      if hasattr(l, "dtype")
                      and jnp.issubdtype(l.dtype, jnp.floating)]
            return c + sum(jnp.sum(l) for l in leaves) * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c
    return run


def slope(fn, n=4):
    r24, r120 = scanify(fn, 24), scanify(fn, 120)
    jax.block_until_ready(r24()); jax.block_until_ready(r120())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(r24())
    t24 = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(r120())
    t120 = (time.perf_counter() - t0) / n
    return (t120 - t24) / 96 * 1e3


# ---- stage shims replicating update_point_seeds internals ----
def geom(sd, eps):
    R_kf = R_w_kf[sd.kf_idx]
    t_kf = t_w_kf[sd.kf_idx]
    R_cw, t_cw = lie.inverse(R_w_cur + eps * 0, t_w_cur + eps)
    R_cr = jnp.einsum("ij,sjk->sik", R_cw, R_kf)
    t_cr = jnp.einsum("ij,sj->si", R_cw, t_kf) + t_cw
    depth = 1.0 / jnp.maximum(sd.mu, 1e-10)
    return R_cr, t_cr, depth


def stage_warp(eps):
    sd = perturb(seeds, eps)
    R_cr, t_cr, depth = geom(sd, eps)
    A = jax.vmap(
        lambda uv, f, d, lv, R, t: matcher_ops.get_warp_affine(
            fxj, fyj, cxj, cyj, uv[None], f[None], d[None], lv[None], R, t)[0]
    )(sd.uv, sd.f, depth, sd.level, R_cr, t_cr)
    A_inv = jnp.linalg.inv(A + 1e-6 * jnp.eye(2))
    slevel = matcher_ops.best_search_level(A, len(cur_pyr) - 1)
    return matcher_ops.warp_patches_affine_atlas(
        perturb(kf_flat, eps), sd.kf_idx, sd.uv, sd.level, A_inv, slevel,
        patch_size=8)


def stage_epi(eps):
    sd = perturb(seeds, eps)
    R_cr, t_cr, depth = geom(sd, eps)
    sigma = jnp.sqrt(jnp.maximum(sd.sigma2, 0.0))
    i_min = jnp.maximum(sd.mu - sigma, 1e-7)
    i_max = sd.mu + sigma
    xyz_far = jnp.einsum("sij,sj->si", R_cr, sd.f / i_min[:, None]) + t_cr
    xyz_near = jnp.einsum("sij,sj->si", R_cr, sd.f / i_max[:, None]) + t_cr
    pb = jnp.zeros((128, 100)) + eps
    cur_atlas, cxo, cso = pack_pyramid_atlas(perturb(cur_pyr, eps))
    sl = jnp.zeros(128, jnp.int32)
    return matcher_ops.epipolar_search_sliding_atlas(
        cur_atlas, cxo, cso, pb, xyz_far[:128], xyz_near[:128], sl,
        jnp.ones(128, bool), fxj, fyj, cxj, cyj, patch_size=8, n_steps=64)


def stage_align(eps):
    sd = perturb(seeds, eps)
    cur_atlas, cxo, cso = pack_pyramid_atlas(perturb(cur_pyr, eps))
    ref = jnp.zeros((S, 64)) + eps
    dx = jnp.ones((S, 64))
    dy = jnp.ones((S, 64))
    d = jnp.stack([jnp.ones(S), jnp.zeros(S)], -1)
    return align_mixed_atlas(
        cur_atlas, cxo, cso, ref, dx, dy, sd.uv * 0.5, d,
        jnp.zeros(S, bool), jnp.zeros(S, jnp.int32), jnp.ones(S, bool),
        patch_size=8, n_iter=10)


def stage_full(eps):
    return df.update_seeds_combined(
        perturb(sub_pt, eps), perturb(sub_ln, eps), R_w_kf, t_w_kf,
        perturb(kf_flat, eps), perturb(cur_pyr, eps), R_w_cur + eps * 0,
        t_w_cur + eps, fxj, fyj, cxj, cyj, bc,
        has_pt=True, has_ln=True, max_seed_kfs=pl_.max_seed_kfs,
        sigma_conv_factor=pl_.seed_convergence_sigma2_thresh,
        max_search=pl_.seed_search_budget, n_epi_steps=pl_.epi_max_steps)


for name, fn in [("FULL combined", stage_full),
                 ("warp (S rows)", stage_warp),
                 ("epi search (128)", stage_epi),
                 ("align_mixed (S rows)", stage_align)]:
    print(f"{name:22s}: {slope(fn):7.2f} ms", flush=True)
