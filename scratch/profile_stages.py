"""TRUE device cost per pipeline stage: each stage runs ITERS times inside
one jitted scan (launch overhead amortized to zero), at real handler state."""
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
      vo._seed_alive.sum(), vo._lnseed_alive.sum())

pl_ = cfg.pipeline
caps = cfg.caps
pyr = build_pyramid(imgs[25], vo.n_levels)
last = vo.last_frame
mt = vo._map_tables()
kwargs = vo._fused_kwargs()
blob = vo._last_blob(last)
specs = vo._blob_specs()
fxj, fyj, cxj, cyj = cam.fx, cam.fy, cam.cx, cam.cy

ITERS = 20


def timeit(fn, *args, n=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n / ITERS * 1000


# shared inputs built once inside each jit
def scanify(stage_fn):
    @jax.jit
    def run(pyr_l, pyr_c, blob, mt, pt_seeds, ln_seeds):
        args = fused.unpack_blob(blob, specs)
        lt = fused.LastFrameTables(*args[:11])
        R_last, t_last, plo, llo = args[11], args[12], args[13], args[14]
        def body(carry, _):
            eps = carry
            out = stage_fn(lt, R_last, t_last, plo, llo, pyr_l, pyr_c,
                           pt_seeds, ln_seeds, eps)
            leaves = [l for l in jax.tree.leaves(out)
                      if hasattr(l, "dtype") and l.dtype == jnp.float32]
            s = sum(jnp.sum(l) for l in leaves)
            return eps + s * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return c
    return run


lv = tuple(range(pl_.klt_max_level, pl_.klt_min_level - 1, -1))


def stage_align(lt, R_last, t_last, plo, llo, pyr_l, pyr_c, pt_s, ln_s, eps):
    pts_in = sparse_align.AlignPoints(
        xyz_ref=lt.pt_f * (lt.pt_depth + eps)[:, None],
        uv_ref=lt.pt_uv, valid=lt.pt_valid)
    segs_in = sparse_align.make_align_segments(
        lt.seg_suv, lt.seg_euv, lt.seg_sf, lt.seg_ef,
        lt.seg_sdepth + eps, lt.seg_edepth, lt.seg_valid,
        n_samples=caps.n_line_samples, fx=fxj, fy=fyj, cx=cxj, cy=cyj)
    return sparse_align.sparse_img_align(
        pyr_l, pyr_c, pts_in, segs_in, jnp.eye(3), jnp.zeros(3),
        fxj, fyj, cxj, cyj, levels=lv, n_iter=pl_.img_align_n_iter,
        patch_size=pl_.img_align_patch_size)


def stage_reproject(lt, R_last, t_last, plo, llo, pyr_l, pyr_c, pt_s, ln_s, eps):
    return reprojector.reproject_combined(
        mt.pt_pos + eps, mt.pt_status, mt.pt_anchor_kf, mt.pt_anchor_uv,
        mt.pt_anchor_f, mt.pt_anchor_level, mt.pt_obs_kf, mt.pt_obs_uv,
        mt.pt_obs_f, mt.pt_obs_level,
        mt.ln_spos, mt.ln_epos, mt.ln_status, mt.ln_anchor_kf,
        mt.ln_anchor_suv, mt.ln_anchor_euv, mt.ln_anchor_sf,
        mt.ln_anchor_ef, mt.ln_anchor_level, mt.kf_R, mt.kf_t,
        vo.map.kf_pyr[: pl_.n_pyr_levels], pyr_c[: pl_.n_pyr_levels],
        R_last, t_last, fxj, fyj, cxj, cyj,
        cell_size=pl_.grid_size, cell_size_segs=pl_.grid_size_segs,
        max_pts_out=caps.max_fts, max_segs_out=caps.max_segs)


def stage_seeds(lt, R_last, t_last, plo, llo, pyr_l, pyr_c, pt_s, ln_s, eps):
    R_w_kf = jnp.swapaxes(mt.kf_R, -1, -2)
    t_w_kf = -jnp.einsum("kji,kj->ki", mt.kf_R, mt.kf_t)
    sub_pt = jax.tree.map(lambda a: a[:256], pt_s)
    sub_ln = jax.tree.map(lambda a: a[:64], ln_s)
    return df.update_seeds_combined(
        sub_pt._replace(mu=sub_pt.mu + eps), sub_ln,
        R_w_kf, t_w_kf, vo.map.kf_pyr[: pl_.n_pyr_levels],
        pyr_c[: pl_.n_pyr_levels], R_last.T, -R_last.T @ t_last,
        fxj, fyj, cxj, cyj, jnp.asarray(vo.batch_counter, jnp.int32),
        has_pt=True, has_ln=True, max_seed_kfs=pl_.max_seed_kfs,
        sigma_conv_factor=pl_.seed_convergence_sigma2_thresh,
        max_search=pl_.seed_search_budget)


def stage_seeds_nosplit(lt, R_last, t_last, plo, llo, pyr_l, pyr_c, pt_s, ln_s, eps):
    R_w_kf = jnp.swapaxes(mt.kf_R, -1, -2)
    t_w_kf = -jnp.einsum("kji,kj->ki", mt.kf_R, mt.kf_t)
    sub_pt = jax.tree.map(lambda a: a[:256], pt_s)
    sub_ln = jax.tree.map(lambda a: a[:64], ln_s)
    return df.update_seeds_combined(
        sub_pt._replace(mu=sub_pt.mu + eps), sub_ln,
        R_w_kf, t_w_kf, vo.map.kf_pyr[: pl_.n_pyr_levels],
        pyr_c[: pl_.n_pyr_levels], R_last.T, -R_last.T @ t_last,
        fxj, fyj, cxj, cyj, jnp.asarray(vo.batch_counter, jnp.int32),
        has_pt=True, has_ln=True, max_seed_kfs=pl_.max_seed_kfs,
        sigma_conv_factor=pl_.seed_convergence_sigma2_thresh,
        max_search=0)


def stage_pose(lt, R_last, t_last, plo, llo, pyr_l, pyr_c, pt_s, ln_s, eps):
    M = caps.max_fts
    G = caps.max_segs
    inp = pose_opt.PoseOptInputs(
        pt_f=lt.pt_f[:M] + eps, pt_level=jnp.zeros(M, jnp.int32),
        pt_pos_w=mt.pt_pos[:M], pt_valid=lt.pt_valid[:M],
        seg_line=jnp.tile(jnp.asarray([[0.6, 0.8, -100.0]]), (G, 1)),
        seg_level=jnp.zeros(G, jnp.int32),
        seg_spos_w=mt.ln_spos[:G], seg_epos_w=mt.ln_epos[:G],
        seg_valid=lt.seg_valid[:G])
    return pose_opt.optimize_pose(
        inp, R_last, t_last, fxj, n_iter=pl_.poseoptim_num_iter,
        reproj_thresh=pl_.poseoptim_thresh)


for name, fn in [("sparse_align", stage_align),
                 ("reproject_combined", stage_reproject),
                 ("seed_update (budget 128)", stage_seeds),
                 ("seed_update (no split)", stage_seeds_nosplit),
                 ("pose_opt", stage_pose)]:
    run = scanify(fn)
    t = timeit(run, last.pyr, pyr, blob, mt, vo.pt_seeds, vo.ln_seeds)
    print(f"{name:28s}: {t:7.3f} ms/frame (device, amortized)")
