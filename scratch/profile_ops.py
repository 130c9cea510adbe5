"""Individual op timings at pipeline shapes (cached compiles, fetch-synced)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from plsvo_tpu.config import Config
from plsvo_tpu.image import build_pyramid
from plsvo_tpu.ops import sparse_align, pose_opt, struct_opt
from plsvo_tpu.pipeline import reprojector

cfg = Config()
caps = cfg.caps
pl_ = cfg.pipeline
W, H = 752, 480
fx = fy = jnp.asarray(460.0)
cx = jnp.asarray(W / 2.0)
cy = jnp.asarray(H / 2.0)
rng = np.random.default_rng(0)

img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
pyr = build_pyramid(img, 5)
pyr2 = build_pyramid(img + 1.0, 5)
K = caps.max_kfs
kf_pyr = [jnp.tile(p[None], (K, 1, 1)) for p in pyr[:3]]


def t(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(jax.device_get(out))
    return (time.perf_counter() - t0) / n * 1000


# ---- sparse align at realistic occupancy ----
F, G, S = caps.max_fts, caps.max_segs, caps.n_line_samples
uv = np.stack([rng.uniform(30, W - 30, F), rng.uniform(30, H - 30, F)], -1).astype(np.float32)
f = np.concatenate([(uv - [W/2, H/2]) / 460.0, np.ones((F, 1))], -1).astype(np.float32)
f /= np.linalg.norm(f, axis=-1, keepdims=True)
pts = sparse_align.AlignPoints(
    xyz_ref=jnp.asarray(f * 2.0), uv_ref=jnp.asarray(uv),
    valid=jnp.asarray(np.arange(F) < 120))
suv = np.stack([rng.uniform(40, W - 80, G), rng.uniform(40, H - 80, G)], -1).astype(np.float32)
euv = suv + rng.uniform(20, 60, (G, 2)).astype(np.float32)
sf = np.concatenate([(suv - [W/2, H/2]) / 460.0, np.ones((G, 1))], -1).astype(np.float32)
sf /= np.linalg.norm(sf, axis=-1, keepdims=True)
ef = np.concatenate([(euv - [W/2, H/2]) / 460.0, np.ones((G, 1))], -1).astype(np.float32)
ef /= np.linalg.norm(ef, axis=-1, keepdims=True)
segs = sparse_align.make_align_segments(
    jnp.asarray(suv), jnp.asarray(euv), jnp.asarray(sf), jnp.asarray(ef),
    jnp.full(G, 2.0), jnp.full(G, 2.0), jnp.asarray(np.arange(G) < 16),
    n_samples=S, fx=fx, fy=fy, cx=cx, cy=cy)

ms = t(sparse_align.sparse_img_align, pyr, pyr2, pts, segs,
       jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy,
       levels=(4, 3, 2), n_iter=30)
print(f"sparse_img_align (3 lvl x <=30 it): {ms:7.1f} ms")

# ---- reprojection ----
P = caps.max_points
O = 4
pt_pos = np.stack([rng.uniform(-2, 2, P), rng.uniform(-2, 2, P),
                   rng.uniform(1, 4, P)], -1).astype(np.float32)
pt_status = (rng.uniform(0, 1, P) < 0.3).astype(np.int8) * 2
args = dict(
    pt_pos=jnp.asarray(pt_pos), pt_status=jnp.asarray(pt_status),
    pt_anchor_kf=jnp.zeros(P, jnp.int32),
    pt_anchor_uv=jnp.asarray(rng.uniform(30, 400, (P, 2)).astype(np.float32)),
    pt_anchor_f=jnp.asarray(f[rng.integers(0, F, P)]),
    pt_anchor_level=jnp.zeros(P, jnp.int32),
    pt_obs_kf=jnp.zeros((P, O), jnp.int32),
    pt_obs_uv=jnp.zeros((P, O, 2)), pt_obs_f=jnp.tile(f[:1][None], (P, O, 1)).reshape(P, O, 3),
    pt_obs_level=jnp.zeros((P, O), jnp.int32),
    kf_R=jnp.tile(jnp.eye(3)[None], (K, 1, 1)), kf_t=jnp.zeros((K, 3)))
ms = t(lambda: reprojector.reproject_points(
    args["pt_pos"], args["pt_status"], args["pt_anchor_kf"], args["pt_anchor_uv"],
    args["pt_anchor_f"], args["pt_anchor_level"], args["pt_obs_kf"], args["pt_obs_uv"],
    args["pt_obs_f"], args["pt_obs_level"], args["kf_R"], args["kf_t"],
    kf_pyr, pyr[:3], jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy,
    cell_size=pl_.grid_size, max_out=caps.max_fts))
print(f"reproject_points                  : {ms:7.1f} ms")

L = caps.max_lines
ln_spos = pt_pos[:L]
ln_epos = ln_spos + rng.uniform(-0.3, 0.3, (L, 3)).astype(np.float32)
ms = t(lambda: reprojector.reproject_segments(
    jnp.asarray(ln_spos), jnp.asarray(ln_epos),
    jnp.asarray((rng.uniform(0, 1, L) < 0.3).astype(np.int8) * 2),
    jnp.zeros(L, jnp.int32),
    jnp.asarray(rng.uniform(30, 400, (L, 2)).astype(np.float32)),
    jnp.asarray(rng.uniform(30, 400, (L, 2)).astype(np.float32)),
    jnp.asarray(sf[rng.integers(0, G, L)]), jnp.asarray(ef[rng.integers(0, G, L)]),
    jnp.zeros(L, jnp.int32),
    args["kf_R"], args["kf_t"], kf_pyr, pyr[:3],
    jnp.eye(3), jnp.zeros(3), fx, fy, cx, cy,
    cell_size=pl_.grid_size_segs, max_out=caps.max_segs))
print(f"reproject_segments                : {ms:7.1f} ms")

# ---- pose opt ----
M = caps.max_fts
inp = pose_opt.PoseOptInputs(
    pt_f=jnp.asarray(f[:M]), pt_level=jnp.zeros(M, jnp.int32),
    pt_pos_w=jnp.asarray(pt_pos[:M]), pt_valid=jnp.asarray(np.arange(M) < 120),
    seg_line=jnp.asarray(rng.normal(0, 1, (caps.max_segs, 3)).astype(np.float32)),
    seg_level=jnp.zeros(caps.max_segs, jnp.int32),
    seg_spos_w=jnp.asarray(ln_spos[:caps.max_segs]),
    seg_epos_w=jnp.asarray(ln_epos[:caps.max_segs]),
    seg_valid=jnp.asarray(np.arange(caps.max_segs) < 16))
ms = t(pose_opt.optimize_pose, inp, jnp.eye(3), jnp.zeros(3), fx,
       n_iter=pl_.poseoptim_num_iter, reproj_thresh=pl_.poseoptim_thresh)
print(f"optimize_pose                     : {ms:7.1f} ms")

# ---- struct opt ----
Kp = pl_.structureoptim_max_pts
obs = struct_opt.StructObs(
    R_f_w=jnp.tile(jnp.eye(3)[None, None], (Kp, O, 1, 1)),
    t_f_w=jnp.zeros((Kp, O, 3)),
    f_obs=jnp.asarray(np.tile(f[:Kp, None], (1, O, 1))),
    valid=jnp.ones((Kp, O), bool))
ms = t(struct_opt.optimize_points, jnp.asarray(pt_pos[:Kp]), obs,
       jnp.ones(Kp, bool), n_iter=5)
print(f"optimize_points (struct)          : {ms:7.1f} ms")

# ---- pyramid ----
ms = t(lambda: build_pyramid(img, 5))
print(f"build_pyramid                     : {ms:7.1f} ms")
