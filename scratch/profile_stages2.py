"""TRUE device cost per stage: every float input perturbed by the scan
carry so NOTHING hoists out of the timing loop; slope over ITERS removes
call overhead."""
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
from plsvo_tpu.pipeline import fused, reprojector
from plsvo_tpu.ops import sparse_align, pose_opt, depth_filter as df
from plsvo_tpu.image import build_pyramid

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = jnp.asarray(np.load("/root/repo/.bench_frames.npz")["imgs"])[:30]

cfg = Config()
vo = FrameHandlerMono(cam, cfg)
for i in range(24):
    vo.add_image(imgs[i], i / 30.0)
print("state: kfs", vo.map.n_keyframes(), "seeds",
      vo._seed_alive.sum(), vo._lnseed_alive.sum(), flush=True)

pl_ = cfg.pipeline
caps = cfg.caps
pyr = tuple(build_pyramid(imgs[25], vo.n_levels))
last = vo.last_frame
mt = vo._map_tables()
kf_flat = vo.map.kf_atlas_flat(pl_.n_pyr_levels)
kwargs = vo._fused_kwargs()
step_kwargs = vo._step_kwargs()
blob = fused.unpack_blob(vo._last_blob(last), vo._blob_specs())
fxj, fyj, cxj, cyj = cam.fx, cam.fy, cam.cx, cam.cy
lt = fused.LastFrameTables(*blob[:11])
R_last, t_last, plo, llo = blob[11], blob[12], blob[13], blob[14]
nxt0 = fused.NextFrameInputs(last=lt, R_last=R_last, t_last=t_last,
                             pt_last_optim=plo, ln_last_optim=llo)


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


def stage_full(eps):
    """The COMPLETE per-frame device program (tables variant)."""
    nxt = perturb(nxt0, eps)
    kw = {k: v for k, v in step_kwargs.items() if k != "specs"}
    return fused._track_frame_step_impl(
        perturb(last.pyr, eps), perturb(pyr, eps), perturb(kf_flat, eps),
        nxt.last, nxt.R_last, nxt.t_last, nxt.pt_last_optim,
        nxt.ln_last_optim, perturb(mt, eps), vo.pt_seeds, vo.ln_seeds,
        jnp.asarray(vo.batch_counter, jnp.int32), fxj, fyj, cxj, cyj,
        emit_next=True, frame_id=jnp.asarray(25, jnp.int32), **kw)


def stage_core(eps):
    """align + reproject + pose + struct (no seed update)."""
    nxt = perturb(nxt0, eps)
    return fused.track_frame_core(
        perturb(last.pyr, eps), perturb(pyr, eps), perturb(kf_flat, eps),
        nxt.last, nxt.R_last, nxt.t_last, perturb(mt, eps),
        nxt.pt_last_optim, nxt.ln_last_optim, fxj, fyj, cxj, cyj, **kwargs)


def stage_align(eps):
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
        n_iter=pl_.img_align_n_iter, patch_size=pl_.img_align_patch_size)


def stage_reproject(eps):
    mt_p = perturb(mt, eps)
    return reprojector.reproject_combined(
        mt_p.pt_pos, mt_p.pt_status, mt_p.pt_anchor_kf, mt_p.pt_anchor_uv,
        mt_p.pt_anchor_f, mt_p.pt_anchor_level, mt_p.pt_obs_kf,
        mt_p.pt_obs_uv, mt_p.pt_obs_f, mt_p.pt_obs_level,
        mt_p.ln_spos, mt_p.ln_epos, mt_p.ln_status, mt_p.ln_anchor_kf,
        mt_p.ln_anchor_suv, mt_p.ln_anchor_euv, mt_p.ln_anchor_sf,
        mt_p.ln_anchor_ef, mt_p.ln_anchor_level, mt_p.kf_R, mt_p.kf_t,
        perturb(kf_flat, eps), perturb(pyr[: pl_.n_pyr_levels], eps),
        perturb(jnp.asarray(last.R_f_w), eps), jnp.asarray(last.t_f_w),
        fxj, fyj, cxj, cyj,
        cell_size=pl_.grid_size, cell_size_segs=pl_.grid_size_segs,
        max_pts_out=caps.max_fts, max_segs_out=caps.max_segs)


def stage_seeds(eps):
    mt_p = perturb(mt, eps)
    R_w_kf = jnp.swapaxes(mt_p.kf_R, -1, -2)
    t_w_kf = -jnp.einsum("kji,kj->ki", mt_p.kf_R, mt_p.kf_t)
    Wp = step_kwargs["pt_width"] or caps.max_seeds
    Wl = step_kwargs["ln_width"] or caps.max_seed_segs
    sub_pt = jax.tree.map(lambda a: a[:Wp], vo.pt_seeds)
    sub_ln = jax.tree.map(lambda a: a[:Wl], vo.ln_seeds)
    return df.update_seeds_combined(
        perturb(sub_pt, eps), perturb(sub_ln, eps), R_w_kf, t_w_kf,
        perturb(kf_flat, eps), perturb(pyr[: pl_.n_pyr_levels], eps),
        perturb(jnp.asarray(last.R_f_w.T), eps),
        jnp.asarray(-last.R_f_w.T @ last.t_f_w),
        fxj, fyj, cxj, cyj, jnp.asarray(vo.batch_counter, jnp.int32),
        has_pt=True, has_ln=bool(vo._lnseed_alive.any()),
        max_seed_kfs=pl_.max_seed_kfs,
        sigma_conv_factor=pl_.seed_convergence_sigma2_thresh,
        max_search=pl_.seed_search_budget)


def stage_pyramid(eps):
    return build_pyramid(imgs[25] + eps, vo.n_levels)


print(f"pt_width={step_kwargs['pt_width']} ln_width={step_kwargs['ln_width']}",
      flush=True)
for name, fn in [("FULL step", stage_full),
                 ("core (align+repro+pose+st)", stage_core),
                 ("sparse_align", stage_align),
                 ("reproject_combined", stage_reproject),
                 ("seed_update", stage_seeds),
                 ("pyramid", stage_pyramid)]:
    print(f"{name:28s}: {slope(fn):7.2f} ms/frame (device, slope)",
          flush=True)


def stage_detect(eps):
    grid, segs, egrid = vo._detect_features(perturb(pyr, eps))
    return grid, segs, egrid


def stage_detect_pts(eps):
    from plsvo_tpu.ops import detection
    return detection.detect_fast_grid(
        perturb(pyr[: pl_.n_pyr_levels], eps), cell_size=pl_.grid_size,
        score_threshold=pl_.triang_min_corner_score)


def stage_detect_lines(eps):
    from plsvo_tpu.ops import lines as line_ops
    det = line_ops.detect_segments(pyr[1] + eps, n_peaks=64)
    return det


def stage_scatter_seeds(eps):
    from plsvo_tpu.ops import depth_filter as dfo
    B = 32
    rows = jnp.arange(B, dtype=jnp.int32)
    mask = jnp.ones(B, bool)
    return dfo.scatter_new_point_seeds(
        perturb(vo.pt_seeds, eps), rows, mask,
        jnp.zeros(B, jnp.int32), jnp.zeros((B, 2)), jnp.zeros((B, 3)),
        jnp.zeros(B, jnp.int32), 0.5, 0.1, 2.0, vo.batch_counter)


for name, fn in [("detect (pts+lines+dedup)", stage_detect),
                 ("detect FAST only", stage_detect_pts),
                 ("detect lines only", stage_detect_lines),
                 ("seed scatter", stage_scatter_seeds)]:
    print(f"{name:28s}: {slope(fn):7.2f} ms (device, slope)", flush=True)
