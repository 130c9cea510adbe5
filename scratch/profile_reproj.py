"""Break reproject_combined's ~9 ms into select / warp / align2d parts
(scanified device timing at real handler state)."""
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
from plsvo_tpu.pipeline import reprojector
from plsvo_tpu.ops import matcher as matcher_ops
from plsvo_tpu.ops.feature_align import align2d_atlas, ref_patch_gradients
from plsvo_tpu.image import build_pyramid, pack_pyramid_atlas

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = jnp.asarray(np.load("/root/repo/.bench_frames.npz")["imgs"])[:30]

cfg = Config()
vo = FrameHandlerMono(cam, cfg)
for i in range(24):
    vo.add_image(imgs[i], i / 30.0)
print("state: kfs", vo.map.n_keyframes())

pl_ = cfg.pipeline
caps = cfg.caps
pyr = build_pyramid(imgs[25], vo.n_levels)
last = vo.last_frame
mt = vo._map_tables()
fxj, fyj, cxj, cyj = cam.fx, cam.fy, cam.cx, cam.cy
R_cur = jnp.asarray(last.R_f_w)
t_cur = jnp.asarray(last.t_f_w)
kf_pyr = vo.map.kf_pyr[: pl_.n_pyr_levels]
cur_sub = pyr[: pl_.n_pyr_levels]
img_shape = (H, W)

ITERS = 20


def timeit(fn, n=4):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n / ITERS * 1000


def scanify(stage_fn):
    @jax.jit
    def run():
        def body(carry, _):
            eps = carry
            out = stage_fn(eps)
            leaves = [l for l in jax.tree.leaves(out)
                      if hasattr(l, "dtype") and
                      jnp.issubdtype(l.dtype, jnp.floating)]
            s = sum(jnp.sum(l) for l in leaves)
            return eps + s * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return c
    return run


def sel_pts(eps):
    return reprojector._select_points(
        mt.pt_pos + eps, mt.pt_status, mt.pt_anchor_kf, mt.pt_anchor_uv,
        mt.pt_anchor_f, mt.pt_anchor_level, mt.pt_obs_kf, mt.pt_obs_uv,
        mt.pt_obs_f, mt.pt_obs_level, mt.kf_R, mt.kf_t, img_shape,
        R_cur, t_cur, fxj, fyj, cxj, cyj,
        cell_size=pl_.grid_size, max_out=caps.max_fts, patch_size=8)


def sel_segs(eps):
    return reprojector._select_segments(
        mt.ln_spos + eps, mt.ln_epos, mt.ln_status, mt.ln_anchor_kf,
        mt.ln_anchor_suv, mt.ln_anchor_euv, mt.ln_anchor_sf, mt.ln_anchor_ef,
        mt.ln_anchor_level, mt.kf_R, mt.kf_t, img_shape,
        R_cur, t_cur, fxj, fyj, cxj, cyj,
        cell_size=pl_.grid_size_segs, max_out=caps.max_segs, patch_size=8)


def build_ri(eps):
    lm_p, sel_p, ri_p = sel_pts(eps)
    lm_s, sel_s, ri_s, ri_e = sel_segs(eps)
    ri = jax.tree.map(lambda *xs: jnp.concatenate(xs), ri_p, ri_s, ri_e)
    return ri


def atlases(eps):
    kf_atlas, kx, ks = pack_pyramid_atlas(kf_pyr)
    cur_atlas, cxo, cs = pack_pyramid_atlas([p + eps for p in cur_sub])
    return kf_atlas, kx, ks, cur_atlas, cxo, cs


def stage_select(eps):
    return build_ri(eps)


def stage_atlas(eps):
    return atlases(eps)


def stage_warp(eps):
    ri = build_ri(0.0)
    kf_atlas, kx, ks, cur_atlas, cxo, cs = atlases(eps)
    A = jax.vmap(
        lambda uv, f, d, lv, R, t: matcher_ops.get_warp_affine(
            fxj, fyj, cxj, cyj, uv[None], f[None], d[None], lv[None], R, t)[0]
    )(ri.uv_ref, ri.f_ref, ri.depth_ref, ri.level_ref, ri.R_ca, ri.t_ca)
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    A_ok = jnp.abs(det) > 1e-6
    A_inv = jnp.linalg.inv(jnp.where(A_ok[:, None, None], A, jnp.eye(2)))
    slevel = matcher_ops.best_search_level(A, len(cur_sub) - 1)
    patches_b, warp_ok = matcher_ops.warp_patches_affine_atlas(
        kf_atlas, kx, ks, ri.kf_idx, ri.uv_ref, ri.level_ref, A_inv,
        slevel, patch_size=8)
    return ref_patch_gradients(patches_b, 8)


def _fixed_align_inputs():
    ri = build_ri(0.0)
    kf_atlas, kx, ks, cur_atlas, cxo, cs = atlases(0.0)
    A = jax.vmap(
        lambda uv, f, d, lv, R, t: matcher_ops.get_warp_affine(
            fxj, fyj, cxj, cyj, uv[None], f[None], d[None], lv[None], R, t)[0]
    )(ri.uv_ref, ri.f_ref, ri.depth_ref, ri.level_ref, ri.R_ca, ri.t_ca)
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    A_ok = jnp.abs(det) > 1e-6
    A_inv = jnp.linalg.inv(jnp.where(A_ok[:, None, None], A, jnp.eye(2)))
    slevel = matcher_ops.best_search_level(A, len(cur_sub) - 1)
    patches_b, warp_ok = matcher_ops.warp_patches_affine_atlas(
        kf_atlas, kx, ks, ri.kf_idx, ri.uv_ref, ri.level_ref, A_inv,
        slevel, patch_size=8)
    rp, rdx, rdy = ref_patch_gradients(patches_b, 8)
    ok0 = ri.valid & warp_ok & A_ok
    scale = 1.0 / (1 << slevel).astype(jnp.float32)
    return (cur_atlas, cxo, cs, rp, rdx, rdy, ri.uv_init * scale[:, None],
            slevel, ok0, scale)


def stage_align2d(eps):
    (cur_atlas, cxo, cs, rp, rdx, rdy, uv0, slevel, ok0, scale) = \
        _fixed_align_inputs()
    return align2d_atlas(cur_atlas, cxo, cs, rp + eps, rdx, rdy,
                         uv0, slevel, ok0, patch_size=8, n_iter=10)


def stage_full(eps):
    return reprojector.reproject_combined(
        mt.pt_pos + eps, mt.pt_status, mt.pt_anchor_kf, mt.pt_anchor_uv,
        mt.pt_anchor_f, mt.pt_anchor_level, mt.pt_obs_kf, mt.pt_obs_uv,
        mt.pt_obs_f, mt.pt_obs_level,
        mt.ln_spos, mt.ln_epos, mt.ln_status, mt.ln_anchor_kf,
        mt.ln_anchor_suv, mt.ln_anchor_euv, mt.ln_anchor_sf,
        mt.ln_anchor_ef, mt.ln_anchor_level, mt.kf_R, mt.kf_t,
        kf_pyr, cur_sub, R_cur, t_cur, fxj, fyj, cxj, cyj,
        cell_size=pl_.grid_size, cell_size_segs=pl_.grid_size_segs,
        max_pts_out=caps.max_fts, max_segs_out=caps.max_segs)


for name, fn in [("select (pts+segs)", stage_select),
                 ("pack atlases", stage_atlas),
                 ("select+warp+grad", stage_warp),
                 ("align2d only (fixed in)", stage_align2d),
                 ("reproject_combined full", stage_full)]:
    run = scanify(fn)
    t = timeit(run)
    print(f"{name:26s}: {t:7.3f} ms/frame (device, amortized)")
