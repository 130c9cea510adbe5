"""Fused DEFAULT-frame core: sparse alignment -> reprojection -> pose
optimization as ONE jitted dispatch with ONE result fetch.

The staged path (frame_handler calling each op separately) pays tunnel +
launch latency per stage; at ~2-3 fps steady state those overheads rival
the math. This module chains the already-jittable stage functions inside a
single jit so XLA sees the whole frame and the host syncs once. The depth
filter stays a separate dispatch (it runs after the host keyframe
decision), and all bookkeeping (counters, deletion rules, table fills)
remains host-side numpy exactly as in the staged path.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from plsvo_tpu.ops import pose_opt, sparse_align, struct_opt
from plsvo_tpu.pipeline import reprojector


class LastFrameTables(NamedTuple):
    """The previous frame's feature tables (uploaded per frame; small)."""

    pt_uv: jnp.ndarray  # (F,2)
    pt_f: jnp.ndarray  # (F,3)
    pt_depth: jnp.ndarray  # (F,) range to landmark (host-computed)
    pt_valid: jnp.ndarray  # (F,)
    seg_suv: jnp.ndarray  # (G,2)
    seg_euv: jnp.ndarray
    seg_sf: jnp.ndarray
    seg_ef: jnp.ndarray
    seg_sdepth: jnp.ndarray
    seg_edepth: jnp.ndarray
    seg_valid: jnp.ndarray


class MapTables(NamedTuple):
    """Device-cached map tables consumed by the fused core."""

    pt_pos: jnp.ndarray
    pt_status: jnp.ndarray
    pt_anchor_kf: jnp.ndarray
    pt_anchor_uv: jnp.ndarray
    pt_anchor_f: jnp.ndarray
    pt_anchor_level: jnp.ndarray
    pt_anchor_type: jnp.ndarray  # (P,) 0=corner 1=edgelet
    pt_anchor_dir: jnp.ndarray  # (P,2) edgelet gradient direction
    pt_obs_kf: jnp.ndarray
    pt_obs_uv: jnp.ndarray
    pt_obs_f: jnp.ndarray
    pt_obs_level: jnp.ndarray
    ln_spos: jnp.ndarray
    ln_epos: jnp.ndarray
    ln_status: jnp.ndarray
    ln_anchor_kf: jnp.ndarray
    ln_anchor_suv: jnp.ndarray
    ln_anchor_euv: jnp.ndarray
    ln_anchor_sf: jnp.ndarray
    ln_anchor_ef: jnp.ndarray
    ln_anchor_level: jnp.ndarray
    ln_obs_kf: jnp.ndarray
    ln_obs_sf: jnp.ndarray
    ln_obs_ef: jnp.ndarray
    kf_R: jnp.ndarray
    kf_t: jnp.ndarray


class FusedResult(NamedTuple):
    R_f_w: jnp.ndarray  # pose after pose optimization
    t_f_w: jnp.ndarray
    cov: jnp.ndarray
    align_seg_alive: jnp.ndarray  # (G,) of the LAST frame
    # point reprojection + pose-opt verdicts (reproject row space)
    pt: reprojector.ReprojResult
    pt_inlier: jnp.ndarray  # (M,)
    pt_f_cur: jnp.ndarray  # (M,3)
    # segment reprojection
    seg: reprojector.ReprojSegResult
    seg_inlier: jnp.ndarray
    seg_sf_cur: jnp.ndarray
    seg_ef_cur: jnp.ndarray
    seg_line_cur: jnp.ndarray
    # structure optimization (top-K least-recently-optimized matches)
    st_pt_lm: jnp.ndarray  # (Kp,) landmark rows
    st_pt_pos: jnp.ndarray  # (Kp,3) refined positions
    st_pt_valid: jnp.ndarray  # (Kp,)
    st_ln_lm: jnp.ndarray
    st_ln_spos: jnp.ndarray
    st_ln_epos: jnp.ndarray
    st_ln_valid: jnp.ndarray


def pack_blob_host(arrays) -> "np.ndarray":
    """Concatenate host arrays into ONE flat f32 buffer (single upload).

    Each upload over the device tunnel costs ~0.8 ms of launch overhead
    regardless of size; the staged path paid it ~13x per frame for the
    last-frame tables alone. Bools become 0/1 floats; int tables must be
    exactly representable in f32 (frame ids, levels — all < 2^24)."""
    import numpy as np

    return np.concatenate(
        [np.asarray(a, np.float32).ravel() for a in arrays])


def unpack_blob(blob, specs):
    """Slice a flat f32 blob back into arrays inside jit.

    specs: tuple of (shape_tuple, kind) with kind in {"f32","bool","i32"}."""
    out = []
    off = 0
    for shape, kind in specs:
        n = 1
        for s in shape:
            n *= s
        a = jax.lax.dynamic_slice_in_dim(blob, off, n).reshape(shape)
        if kind == "bool":
            a = a > 0.5
        elif kind == "i32":
            a = a.astype(jnp.int32)
        out.append(a)
        off += n
    return out


# ---------------------------------------------------------------------------
# Flat-packed result fetch: jax.device_get on a pytree moves every leaf as
# its own transfer — ~0.9 ms of tunnel round-trip PER ARRAY on the remote
# TPU (measured: 2714 leaf fetches = 2.4 s over a 72-frame run). flatpack
# concatenates all leaves into ONE f32 vector on device (one eager concat
# launch); the host fetches one array and splits it back with numpy.
# Integer leaves must be exactly representable in f32 (all are: landmark
# rows < 2^24, levels, counts).
# ---------------------------------------------------------------------------


@jax.jit
def _concat_f32(leaves):
    return jnp.concatenate([l.astype(jnp.float32).ravel() for l in leaves])


_FETCH_DROP = ("pt_f_cur", "seg_sf_cur", "seg_ef_cur", "seg_line_cur")


def fetch_view(res: "FusedResult") -> "FusedResult":
    """FusedResult with the host-recomputable fields dropped from the
    fetch payload (~22% of the per-frame transfer): pt_f_cur and the
    segment bearings/line coeffs are plain unprojections of uv fields the
    host fetches anyway — FrameHandlerMono._post_fused recomputes them
    with its numpy helpers. The full FusedResult still exists ON DEVICE
    (pose-opt inputs, build_next_inputs); only the transfer shrinks."""
    # keep any leading batch axes so per-sequence slicing still works
    return res._replace(**{
        k: jnp.zeros(getattr(res, k).shape[:-2] + (0,), jnp.float32)
        for k in _FETCH_DROP})


def flatpack(tree):
    """(device flat vector, meta) from any pytree of device arrays."""
    leaves, treedef = jax.tree.flatten(tree)
    specs = [(l.shape, l.dtype) for l in leaves]
    if not leaves:
        return jnp.zeros((0,), jnp.float32), (specs, treedef)
    flat = _concat_f32(tuple(leaves))
    return flat, (specs, treedef)


_FETCH_POOL = None


def _fetch_pool():
    global _FETCH_POOL
    if _FETCH_POOL is None:
        import concurrent.futures

        # ONE worker: fetches complete in dispatch order (device queue
        # order), and a single thread avoids concurrent-transfer contention
        # on the tunnel
        _FETCH_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="plsvo-fetch")
    return _FETCH_POOL


def submit_fetch(flat):
    """Hand the blocking device_get of ONE flat vector to the background
    thread; returns a future.

    Fetch economics over the remote-TPU tunnel (scratch/micro_fetch.py):
    every device_get of freshly computed data costs ~80 ms of round-trip
    REGARDLESS of payload, plus ~30 MB/s of bandwidth — so results must be
    concatenated into ONE vector per drain window (never per frame), and
    the round-trip runs off-thread (GIL released during the PJRT
    transfer) so it overlaps the main thread's dispatches. NOTE:
    jax.Array.copy_to_host_async is NOT used — on this backend it
    snapshots before the producing program commits and device_get then
    returns garbage (observed: seed-detection fetches corrupted)."""
    return _fetch_pool().submit(jax.device_get, flat)


def flatunpack(flat_np, meta):
    """Rebuild the pytree (numpy leaves) from the fetched flat vector."""
    import numpy as np

    specs, treedef = meta
    out = []
    off = 0
    for shape, dtype in specs:
        n = 1
        for s in shape:
            n *= s
        a = flat_np[off:off + n].reshape(shape)
        if dtype == jnp.bool_ or dtype == bool:
            a = a > 0.5
        elif np.issubdtype(dtype, np.integer):
            a = np.rint(a).astype(dtype)
        out.append(a)
        off += n
    return jax.tree.unflatten(treedef, out)


def _unproject(uv, fx, fy, cx, cy):
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    f = jnp.stack([x, y, jnp.ones_like(x)], -1)
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=(
    "levels", "n_iter_align", "patch_align", "cell_size", "cell_size_segs",
    "max_pts_out", "max_segs_out", "n_line_samples", "poseopt_iters", "poseopt_iters_ref",
    "poseopt_thresh", "n_pyr_use", "has_ls", "has_edgelets", "n_struct_pts",
    "n_struct_segs", "struct_iters"))
def track_frame_core(
    last_pyr: Sequence[jnp.ndarray],
    cur_pyr: Sequence[jnp.ndarray],
    kf_pyr: Sequence[jnp.ndarray],  # stacks (K,h,w), first n_pyr_use levels
    last: LastFrameTables,
    R_last: jnp.ndarray, t_last: jnp.ndarray,  # T_f_w of last frame
    mt: MapTables,
    pt_last_optim: jnp.ndarray,  # (P,) f32 last-optimized frame ids
    ln_last_optim: jnp.ndarray,  # (L,) f32
    fx, fy, cx, cy,
    *,
    levels: Tuple[int, ...],
    n_iter_align: int = 30,
    patch_align: int = 4,
    cell_size: int = 25,
    cell_size_segs: int = 25,
    max_pts_out: int = 192,
    max_segs_out: int = 96,
    n_line_samples: int = 8,
    poseopt_iters: int = 10,
    poseopt_iters_ref: int = 0,
    poseopt_thresh: float = 2.0,
    n_pyr_use: int = 3,
    has_ls: bool = True,
    has_edgelets: bool = False,
    n_struct_pts: int = 20,
    n_struct_segs: int = 20,
    struct_iters: int = 5,
) -> FusedResult:
    # ---- 1. sparse image alignment against the last frame ----
    pts_in = sparse_align.AlignPoints(
        xyz_ref=last.pt_f * last.pt_depth[:, None],
        uv_ref=last.pt_uv, valid=last.pt_valid)
    segs_in = sparse_align.make_align_segments(
        last.seg_suv, last.seg_euv, last.seg_sf, last.seg_ef,
        last.seg_sdepth, last.seg_edepth, last.seg_valid,
        n_samples=n_line_samples, fx=fx, fy=fy, cx=cx, cy=cy)
    ares = sparse_align.sparse_img_align(
        last_pyr, cur_pyr, pts_in, segs_in, jnp.eye(3), jnp.zeros(3),
        fx, fy, cx, cy, levels=levels, n_iter=n_iter_align,
        patch_size=patch_align)
    R_cur = ares.R @ R_last
    t_cur = ares.R @ t_last + ares.t

    cur_sub = cur_pyr[:n_pyr_use]

    # ---- 2. reprojection + batched refinement (points + both segment
    # endpoints refined in ONE find_match_direct batch when lines are on) ----
    if has_ls:
        pt_res, seg_res = reprojector.reproject_combined(
            mt.pt_pos, mt.pt_status, mt.pt_anchor_kf, mt.pt_anchor_uv,
            mt.pt_anchor_f, mt.pt_anchor_level, mt.pt_obs_kf, mt.pt_obs_uv,
            mt.pt_obs_f, mt.pt_obs_level,
            mt.ln_spos, mt.ln_epos, mt.ln_status, mt.ln_anchor_kf,
            mt.ln_anchor_suv, mt.ln_anchor_euv, mt.ln_anchor_sf,
            mt.ln_anchor_ef, mt.ln_anchor_level, mt.kf_R, mt.kf_t,
            kf_pyr, cur_sub, R_cur, t_cur, fx, fy, cx, cy,
            cell_size=cell_size, cell_size_segs=cell_size_segs,
            max_pts_out=max_pts_out, max_segs_out=max_segs_out,
            has_edgelets=has_edgelets, pt_anchor_type=mt.pt_anchor_type,
            pt_anchor_dir=mt.pt_anchor_dir)
    else:
        pt_res = reprojector.reproject_points(
            mt.pt_pos, mt.pt_status, mt.pt_anchor_kf, mt.pt_anchor_uv,
            mt.pt_anchor_f, mt.pt_anchor_level, mt.pt_obs_kf, mt.pt_obs_uv,
            mt.pt_obs_f, mt.pt_obs_level, mt.kf_R, mt.kf_t,
            kf_pyr, cur_sub, R_cur, t_cur, fx, fy, cx, cy,
            cell_size=cell_size, max_out=max_pts_out,
            has_edgelets=has_edgelets, pt_anchor_type=mt.pt_anchor_type,
            pt_anchor_dir=mt.pt_anchor_dir)
    pt_f_cur = _unproject(pt_res.uv, fx, fy, cx, cy)

    if has_ls:
        seg_sf_cur = _unproject(seg_res.s_uv, fx, fy, cx, cy)
        seg_ef_cur = _unproject(seg_res.e_uv, fx, fy, cx, cy)
        seg_line = pose_opt.line_coeffs_from_bearings(seg_sf_cur, seg_ef_cur)
        seg_valid_po = seg_res.matched
        seg_spos = mt.ln_spos[seg_res.lm_idx]
        seg_epos = mt.ln_epos[seg_res.lm_idx]
        seg_level_po = seg_res.level
    else:
        M = max_segs_out
        seg_res = reprojector.ReprojSegResult(
            lm_idx=jnp.zeros(M, jnp.int32), selected=jnp.zeros(M, bool),
            s_uv=jnp.zeros((M, 2)), e_uv=jnp.zeros((M, 2)),
            level=jnp.zeros(M, jnp.int32), matched=jnp.zeros(M, bool),
            n_attempts=jnp.zeros((), jnp.int32),
            n_matches=jnp.zeros((), jnp.int32))
        seg_sf_cur = jnp.zeros((M, 3))
        seg_ef_cur = jnp.zeros((M, 3))
        seg_line = jnp.zeros((M, 3))
        seg_valid_po = jnp.zeros(M, bool)
        seg_spos = jnp.zeros((M, 3))
        seg_epos = jnp.zeros((M, 3))
        seg_level_po = jnp.zeros(M, jnp.int32)

    # ---- 3. pose optimization on the matched features ----
    inp = pose_opt.PoseOptInputs(
        pt_f=pt_f_cur, pt_level=pt_res.level,
        pt_pos_w=mt.pt_pos[pt_res.lm_idx], pt_valid=pt_res.matched,
        seg_line=seg_line, seg_level=seg_level_po,
        seg_spos_w=seg_spos, seg_epos_w=seg_epos, seg_valid=seg_valid_po)
    pres = pose_opt.optimize_pose(
        inp, R_cur, t_cur, fx, n_iter=poseopt_iters,
        n_iter_ref=poseopt_iters_ref, reproj_thresh=poseopt_thresh)

    # ---- 4. structure optimization (frame_handler_base.cpp:202-237):
    # top-K least-recently-optimized landmarks among this frame's matches ----
    key_pt = jnp.where(pt_res.matched,
                       -pt_last_optim[pt_res.lm_idx].astype(jnp.float32),
                       -jnp.inf)
    _, sel_i = jax.lax.top_k(key_pt, n_struct_pts)
    st_pt_lm = pt_res.lm_idx[sel_i]
    st_pt_valid = pt_res.matched[sel_i]
    okf = mt.pt_obs_kf[st_pt_lm]
    obs = struct_opt.StructObs(
        R_f_w=mt.kf_R[jnp.maximum(okf, 0)],
        t_f_w=mt.kf_t[jnp.maximum(okf, 0)],
        f_obs=mt.pt_obs_f[st_pt_lm],
        valid=okf >= 0)

    key_sg = jnp.where(seg_res.matched,
                       -ln_last_optim[seg_res.lm_idx].astype(jnp.float32),
                       -jnp.inf)
    _, ssel_i = jax.lax.top_k(key_sg, n_struct_segs)
    st_ln_lm = seg_res.lm_idx[ssel_i]
    st_ln_valid = seg_res.matched[ssel_i]
    lokf = mt.ln_obs_kf[st_ln_lm]
    lo_kfc = jnp.maximum(lokf, 0)
    s_obs = struct_opt.StructObs(
        R_f_w=mt.kf_R[lo_kfc], t_f_w=mt.kf_t[lo_kfc],
        f_obs=mt.ln_obs_sf[st_ln_lm], valid=lokf >= 0)
    e_obs = struct_opt.StructObs(
        R_f_w=mt.kf_R[lo_kfc], t_f_w=mt.kf_t[lo_kfc],
        f_obs=mt.ln_obs_ef[st_ln_lm], valid=lokf >= 0)
    # points + both endpoint sets through ONE batched 3x3 GN (obs slot
    # counts may differ between point and line tables — pad to the max)
    Op = obs.valid.shape[1]
    Ol = s_obs.valid.shape[1]
    Om = max(Op, Ol)

    def pad_obs(o, O):
        if O == Om:
            return o
        pad = Om - O
        return struct_opt.StructObs(
            R_f_w=jnp.pad(o.R_f_w, ((0, 0), (0, pad), (0, 0), (0, 0))),
            t_f_w=jnp.pad(o.t_f_w, ((0, 0), (0, pad), (0, 0))),
            f_obs=jnp.pad(o.f_obs, ((0, 0), (0, pad), (0, 0))),
            valid=jnp.pad(o.valid, ((0, 0), (0, pad))))

    all_obs = jax.tree.map(
        lambda *xs: jnp.concatenate(xs),
        pad_obs(obs, Op), pad_obs(s_obs, Ol), pad_obs(e_obs, Ol))
    all_pos = jnp.concatenate(
        [mt.pt_pos[st_pt_lm], mt.ln_spos[st_ln_lm], mt.ln_epos[st_ln_lm]])
    all_valid = jnp.concatenate([st_pt_valid, st_ln_valid, st_ln_valid])
    all_new, all_impr = struct_opt.optimize_points(
        all_pos, all_obs, all_valid, n_iter=struct_iters)
    Kp = n_struct_pts
    Kl = n_struct_segs
    st_pt_pos = all_new[:Kp]
    st_pt_valid = st_pt_valid & all_impr[:Kp]
    st_ln_spos = all_new[Kp:Kp + Kl]
    st_ln_epos = all_new[Kp + Kl:]
    st_ln_valid = st_ln_valid & all_impr[Kp:Kp + Kl] & all_impr[Kp + Kl:]

    return FusedResult(
        R_f_w=pres.R, t_f_w=pres.t, cov=pres.cov,
        align_seg_alive=ares.seg_alive,
        pt=pt_res, pt_inlier=pres.pt_inlier, pt_f_cur=pt_f_cur,
        seg=seg_res, seg_inlier=pres.seg_inlier,
        seg_sf_cur=seg_sf_cur, seg_ef_cur=seg_ef_cur, seg_line_cur=seg_line,
        st_pt_lm=st_pt_lm, st_pt_pos=st_pt_pos, st_pt_valid=st_pt_valid,
        st_ln_lm=st_ln_lm, st_ln_spos=st_ln_spos, st_ln_epos=st_ln_epos,
        st_ln_valid=st_ln_valid)


# ---------------------------------------------------------------------------
# Map-table DELTA path: MapTables live on device as a step-to-step CARRY
# (like the seed tables); host-initiated changes (harvested landmarks,
# status changes, keyframe installs/evictions, BA write-backs) ship as ONE
# fixed-width f32 blob per frame and are applied IN-GRAPH before the step.
# Struct-opt refinements are applied in-graph after the step (they are
# computed on device anyway), so the steady-state host->device traffic for
# the whole map is a single small upload. This removes the per-keyframe
# full-table re-upload storm (the r4 batched drain stalls) and the
# per-frame pt_pos/ln_pos uploads (VERDICT r4 next #1/#2).
#
# Blob layout (matches MapState.pack_mt_deltas; all f32, ints < 2^24):
#   [NE]                      evicted KF slots (-1 = none)
#   [K*9 + K*3]               kf_R, kf_t (always-current full copy; tiny)
#   point rows (DP wide):     idx, mask, obs_reset, pos(3), status,
#                             anchor_kf, anchor_uv(2), anchor_f(3),
#                             anchor_level, anchor_type, anchor_dir(2)
#   line rows (DL wide):      idx, mask, obs_reset, spos(3), epos(3),
#                             status, anchor_kf, anchor_suv(2),
#                             anchor_euv(2), anchor_sf(3), anchor_ef(3),
#                             anchor_level
#   point obs (OP wide):      row, slot, mask, kf, uv(2), f(3), level
#   line obs (OL wide):       row, slot, mask, kf, sf(3), ef(3)
#
# Apply order (consistency with the host mirror, whose values are read at
# PACK time): evict-clears -> row deltas (incl. per-row obs resets) ->
# obs deltas. A slot evicted then reused within one window is handled:
# the clear drops stale references, the obs deltas re-install the new ones.
# ---------------------------------------------------------------------------

MT_DELTA_DP = 256  # point-row delta capacity per blob (overflow spills
MT_DELTA_DL = 96   # to the next frame's blob — deltas are idempotent
MT_DELTA_OP = 256  # full-row snapshots, so spilling only delays sync)
MT_DELTA_OL = 96
# eviction list is NEVER allowed to spill (a spilled evict-sweep would
# wipe obs appends for a reused slot shipped in an earlier blob): size it
# to the keyframe ring so every queued eviction always ships at once
MT_DELTA_NE = 16


def mt_delta_len(K: int, DP: int = MT_DELTA_DP, DL: int = MT_DELTA_DL,
                 OP: int = MT_DELTA_OP, OL: int = MT_DELTA_OL,
                 NE: int = MT_DELTA_NE) -> int:
    return (NE + K * 12 + DP * 17 + DL * 22 + OP * 10 + OL * 10)


def map_tables_from_state(m) -> "MapTables":
    """Fresh device MapTables from a MapState mirror (full upload — the
    carry RESYNC point; per-frame sync goes through apply_mt_deltas)."""
    return MapTables(
        pt_pos=m.dev("pt_pos"), pt_status=m.dev("pt_status"),
        pt_anchor_kf=m.dev("pt_anchor_kf"),
        pt_anchor_uv=m.dev("pt_anchor_uv"),
        pt_anchor_f=m.dev("pt_anchor_f"),
        pt_anchor_level=m.dev("pt_anchor_level"),
        pt_anchor_type=m.dev("pt_anchor_type"),
        pt_anchor_dir=m.dev("pt_anchor_dir"),
        pt_obs_kf=m.dev_obs("pt_obs_kf"),
        pt_obs_uv=m.dev_obs("pt_obs_uv"),
        pt_obs_f=m.dev_obs("pt_obs_f"),
        pt_obs_level=m.dev_obs("pt_obs_level"),
        ln_spos=m.dev("ln_spos"), ln_epos=m.dev("ln_epos"),
        ln_status=m.dev("ln_status"), ln_anchor_kf=m.dev("ln_anchor_kf"),
        ln_anchor_suv=m.dev("ln_anchor_suv"),
        ln_anchor_euv=m.dev("ln_anchor_euv"),
        ln_anchor_sf=m.dev("ln_anchor_sf"),
        ln_anchor_ef=m.dev("ln_anchor_ef"),
        ln_anchor_level=m.dev("ln_anchor_level"),
        ln_obs_kf=m.dev_obs("ln_obs_kf"),
        ln_obs_sf=m.dev_obs("ln_obs_sf"),
        ln_obs_ef=m.dev_obs("ln_obs_ef"),
        kf_R=m.dev("kf_R"), kf_t=m.dev("kf_t"))


@partial(jax.jit, static_argnames=("DP", "DL", "OP", "OL", "NE"))
def apply_mt_deltas(mt: "MapTables", blob: jnp.ndarray, *,
                    DP: int = MT_DELTA_DP, DL: int = MT_DELTA_DL,
                    OP: int = MT_DELTA_OP, OL: int = MT_DELTA_OL,
                    NE: int = MT_DELTA_NE) -> "MapTables":
    """In-graph application of a host delta blob onto the device carry."""
    K = mt.kf_R.shape[0]
    P = mt.pt_pos.shape[0]
    L = mt.ln_spos.shape[0]
    off = 0

    def take(n, shape=None):
        nonlocal off
        a = jax.lax.dynamic_slice_in_dim(blob, off, n)
        off += n
        return a if shape is None else a.reshape(shape)

    evict = take(NE).astype(jnp.int32)  # (NE,)
    kf_R = take(K * 9, (K, 3, 3))
    kf_t = take(K * 3, (K, 3))

    # --- 1. evict-clears on the obs tables ---
    pt_obs_kf = mt.pt_obs_kf
    ln_obs_kf = mt.ln_obs_kf
    pt_dead = (pt_obs_kf[None] == evict[:, None, None]).any(0)
    ln_dead = (ln_obs_kf[None] == evict[:, None, None]).any(0)
    pt_obs_kf = jnp.where(pt_dead, -1, pt_obs_kf)
    ln_obs_kf = jnp.where(ln_dead, -1, ln_obs_kf)

    # --- 2. point row deltas ---
    rows = take(DP).astype(jnp.int32)
    mask = take(DP) > 0.5
    obs_reset = take(DP) > 0.5
    rp = jnp.where(mask, rows, P)  # out-of-range rows drop
    pos = take(DP * 3, (DP, 3))
    status = take(DP)
    a_kf = take(DP)
    a_uv = take(DP * 2, (DP, 2))
    a_f = take(DP * 3, (DP, 3))
    a_lvl = take(DP)
    a_typ = take(DP)
    a_dir = take(DP * 2, (DP, 2))
    st_dtype = mt.pt_status.dtype
    mt_new = dict(
        pt_pos=mt.pt_pos.at[rp].set(pos, mode="drop"),
        pt_status=mt.pt_status.at[rp].set(status.astype(st_dtype),
                                          mode="drop"),
        pt_anchor_kf=mt.pt_anchor_kf.at[rp].set(
            a_kf.astype(mt.pt_anchor_kf.dtype), mode="drop"),
        pt_anchor_uv=mt.pt_anchor_uv.at[rp].set(a_uv, mode="drop"),
        pt_anchor_f=mt.pt_anchor_f.at[rp].set(a_f, mode="drop"),
        pt_anchor_level=mt.pt_anchor_level.at[rp].set(
            a_lvl.astype(mt.pt_anchor_level.dtype), mode="drop"),
        pt_anchor_type=mt.pt_anchor_type.at[rp].set(
            a_typ.astype(mt.pt_anchor_type.dtype), mode="drop"),
        pt_anchor_dir=mt.pt_anchor_dir.at[rp].set(a_dir, mode="drop"),
        kf_R=kf_R, kf_t=kf_t)
    rp_reset = jnp.where(mask & obs_reset, rows, P)
    pt_obs_kf = pt_obs_kf.at[rp_reset].set(-1, mode="drop")

    # --- 3. line row deltas ---
    rows = take(DL).astype(jnp.int32)
    mask = take(DL) > 0.5
    obs_reset = take(DL) > 0.5
    rl = jnp.where(mask, rows, L)
    spos = take(DL * 3, (DL, 3))
    epos = take(DL * 3, (DL, 3))
    status = take(DL)
    a_kf = take(DL)
    a_suv = take(DL * 2, (DL, 2))
    a_euv = take(DL * 2, (DL, 2))
    a_sf = take(DL * 3, (DL, 3))
    a_ef = take(DL * 3, (DL, 3))
    a_lvl = take(DL)
    mt_new.update(
        ln_spos=mt.ln_spos.at[rl].set(spos, mode="drop"),
        ln_epos=mt.ln_epos.at[rl].set(epos, mode="drop"),
        ln_status=mt.ln_status.at[rl].set(
            status.astype(mt.ln_status.dtype), mode="drop"),
        ln_anchor_kf=mt.ln_anchor_kf.at[rl].set(
            a_kf.astype(mt.ln_anchor_kf.dtype), mode="drop"),
        ln_anchor_suv=mt.ln_anchor_suv.at[rl].set(a_suv, mode="drop"),
        ln_anchor_euv=mt.ln_anchor_euv.at[rl].set(a_euv, mode="drop"),
        ln_anchor_sf=mt.ln_anchor_sf.at[rl].set(a_sf, mode="drop"),
        ln_anchor_ef=mt.ln_anchor_ef.at[rl].set(a_ef, mode="drop"),
        ln_anchor_level=mt.ln_anchor_level.at[rl].set(
            a_lvl.astype(mt.ln_anchor_level.dtype), mode="drop"))
    rl_reset = jnp.where(mask & obs_reset, rows, L)
    ln_obs_kf = ln_obs_kf.at[rl_reset].set(-1, mode="drop")

    # --- 4. point obs deltas ---
    orow = take(OP).astype(jnp.int32)
    oslot = take(OP).astype(jnp.int32)
    omask = take(OP) > 0.5
    okf = take(OP)
    ouv = take(OP * 2, (OP, 2))
    of = take(OP * 3, (OP, 3))
    olvl = take(OP)
    orp = jnp.where(omask, orow, P)
    mt_new.update(
        pt_obs_kf=pt_obs_kf.at[orp, oslot].set(
            okf.astype(pt_obs_kf.dtype), mode="drop"),
        pt_obs_uv=mt.pt_obs_uv.at[orp, oslot].set(ouv, mode="drop"),
        pt_obs_f=mt.pt_obs_f.at[orp, oslot].set(of, mode="drop"),
        pt_obs_level=mt.pt_obs_level.at[orp, oslot].set(
            olvl.astype(mt.pt_obs_level.dtype), mode="drop"))

    # --- 5. line obs deltas ---
    orow = take(OL).astype(jnp.int32)
    oslot = take(OL).astype(jnp.int32)
    omask = take(OL) > 0.5
    okf = take(OL)
    osf = take(OL * 3, (OL, 3))
    oef = take(OL * 3, (OL, 3))
    orl = jnp.where(omask, orow, L)
    mt_new.update(
        ln_obs_kf=ln_obs_kf.at[orl, oslot].set(
            okf.astype(ln_obs_kf.dtype), mode="drop"),
        ln_obs_sf=mt.ln_obs_sf.at[orl, oslot].set(osf, mode="drop"),
        ln_obs_ef=mt.ln_obs_ef.at[orl, oslot].set(oef, mode="drop"))
    return mt._replace(**mt_new)


def apply_struct_to_mt(mt: "MapTables", res: "FusedResult") -> "MapTables":
    """Scatter this frame's structure-opt refinements into the device
    carry (the host applies the same values to its mirror when the result
    is fetched, a window later in pipelined mode)."""
    P = mt.pt_pos.shape[0]
    L = mt.ln_spos.shape[0]
    rp = jnp.where(res.st_pt_valid, res.st_pt_lm, P)
    rl = jnp.where(res.st_ln_valid, res.st_ln_lm, L)
    return mt._replace(
        pt_pos=mt.pt_pos.at[rp].set(res.st_pt_pos, mode="drop"),
        ln_spos=mt.ln_spos.at[rl].set(res.st_ln_spos, mode="drop"),
        ln_epos=mt.ln_epos.at[rl].set(res.st_ln_epos, mode="drop"))


def last_blob_specs(F: int, G: int, P: int, L: int):
    """Blob layout for the per-frame host-built tables: the last frame's
    feature tables + pose and the landmark last-optimized stamps. One
    upload replaces ~15 (see pack_blob_host)."""
    return (
        ((F, 2), "f32"),   # pt_uv
        ((F, 3), "f32"),   # pt_f
        ((F,), "f32"),     # pt_depth
        ((F,), "bool"),    # pt_valid
        ((G, 2), "f32"),   # seg_suv
        ((G, 2), "f32"),   # seg_euv
        ((G, 3), "f32"),   # seg_sf
        ((G, 3), "f32"),   # seg_ef
        ((G,), "f32"),     # seg_sdepth
        ((G,), "f32"),     # seg_edepth
        ((G,), "bool"),    # seg_valid
        ((3, 3), "f32"),   # R_last
        ((3,), "f32"),     # t_last
        ((P,), "f32"),     # pt_last_optim
        ((L,), "f32"),     # ln_last_optim
    )


class FullStepResult(NamedTuple):
    fused: FusedResult
    pt_seeds: object  # PointSeeds (device-resident; NOT fetched per frame)
    ln_seeds: object  # LineSeeds or None
    # COMPACT per-frame seed sync (fetched every frame, so sized for the
    # wire): converged rows/depths compacted to CONV_BUDGET entries,
    # alive masks bit-packed 16 flags per exact-int f32 word
    pt_conv: object  # (rows[K], depth[K], n_conv, alive_packed, n_starved)
    ln_conv: object  # (rows[K], d_s[K], d_e[K], n_conv, alive_packed,
    #                  n_starved) or None
    next: object = None  # NextFrameInputs (pipelined mode) or None
    mt: object = None  # MapTables CARRY: input deltas + struct-opt applied


CONV_BUDGET = 64  # converged-seed reports per frame (observed <= ~15; a
#                   convergence beyond the budget would lose its candidate
#                   landmark, so the budget is generous)


def pack_bits16(mask: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool -> (ceil(N/16),) f32 of exact 16-bit integers."""
    N = mask.shape[0]
    pad = (-N) % 16
    m = jnp.pad(mask.astype(jnp.float32), (0, pad)).reshape(-1, 16)
    return m @ (2.0 ** jnp.arange(16, dtype=jnp.float32))


def unpack_bits16(words, n: int):
    """Inverse of pack_bits16 on HOST numpy."""
    import numpy as np

    w = np.asarray(words, np.int64)
    bits = (w[:, None] >> np.arange(16)[None, :]) & 1
    return bits.reshape(-1)[:n].astype(bool)


class NextFrameInputs(NamedTuple):
    """Device-resident inputs for the NEXT frame's step (pipelined mode):
    the host never needs to see this frame's results before dispatching the
    next frame — the ~25 ms fetch sync and the host bookkeeping overlap
    with the next frame's device compute."""

    last: LastFrameTables  # this frame's matched features as align inputs
    R_last: jnp.ndarray  # stabilized (Gram-Schmidt) optimized pose
    t_last: jnp.ndarray
    pt_last_optim: jnp.ndarray  # (P,) f32, updated with this frame's
    ln_last_optim: jnp.ndarray  # structure-opt selections
    pyr: object = None  # this frame's pyramid (tuple of levels): the next
    #                     chained step's last_pyr — so chained steps can
    #                     take a RAW image and build their pyramid in-graph


def _gram_schmidt(R):
    """Row-wise Gram-Schmidt, identical to the host drift control in
    FrameHandlerMono._post_fused."""
    x = R[0] / jnp.maximum(jnp.linalg.norm(R[0]), 1e-12)
    y = R[1] - jnp.dot(x, R[1]) * x
    y = y / jnp.maximum(jnp.linalg.norm(y), 1e-12)
    return jnp.stack([x, y, jnp.cross(x, y)])


def build_next_inputs(res: FusedResult, mt: MapTables,
                      pt_last_optim, ln_last_optim,
                      frame_id: jnp.ndarray,
                      cur_pyr=None) -> NextFrameInputs:
    """Assemble the next frame's align inputs from this frame's results, on
    device. Matches the host path (_last_blob) except: landmark-status
    deletions decided by host counters lag one frame (the row is still
    masked by matched & inlier, so at worst a just-deleted landmark
    contributes one extra frame of photometric alignment)."""
    R = _gram_schmidt(res.R_f_w)
    t = res.t_f_w
    center = -R.T @ t
    lm = res.pt.lm_idx
    pt_valid = res.pt.matched & res.pt_inlier & (mt.pt_status[lm] > 0)
    pt_depth = jnp.linalg.norm(mt.pt_pos[lm] - center[None], axis=-1)
    slm = res.seg.lm_idx
    seg_valid = res.seg.matched & res.seg_inlier & (mt.ln_status[slm] > 0)
    s_depth = jnp.linalg.norm(mt.ln_spos[slm] - center[None], axis=-1)
    e_depth = jnp.linalg.norm(mt.ln_epos[slm] - center[None], axis=-1)
    last = LastFrameTables(
        pt_uv=res.pt.uv, pt_f=res.pt_f_cur, pt_depth=pt_depth,
        pt_valid=pt_valid,
        seg_suv=res.seg.s_uv, seg_euv=res.seg.e_uv,
        seg_sf=res.seg_sf_cur, seg_ef=res.seg_ef_cur,
        seg_sdepth=s_depth, seg_edepth=e_depth, seg_valid=seg_valid)
    fid = frame_id.astype(jnp.float32)
    plo = pt_last_optim.at[jnp.where(res.st_pt_valid, res.st_pt_lm,
                                     pt_last_optim.shape[0])].set(
        fid, mode="drop")
    llo = ln_last_optim.at[jnp.where(res.st_ln_valid, res.st_ln_lm,
                                     ln_last_optim.shape[0])].set(
        fid, mode="drop")
    return NextFrameInputs(last=last, R_last=R, t_last=t,
                           pt_last_optim=plo, ln_last_optim=llo,
                           pyr=None if cur_pyr is None else tuple(cur_pyr))


@partial(jax.jit, static_argnames=(
    "specs", "update_pt_seeds", "update_ln_seeds", "max_seed_kfs",
    "seed_search_budget", "n_epi_steps", "seed_work_budget",
    "sigma_conv_factor", "n_pyr_seed", "emit_next", "pt_width", "ln_width",
    "levels", "n_iter_align", "patch_align", "cell_size",
    "cell_size_segs", "max_pts_out", "max_segs_out", "n_line_samples",
    "poseopt_iters", "poseopt_iters_ref", "poseopt_thresh", "n_pyr_use", "has_ls", "has_edgelets", "n_struct_pts",
    "n_struct_segs", "struct_iters"))
def track_frame_step(
    last_pyr, cur_pyr, kf_pyr,
    blob: jnp.ndarray,
    mt: MapTables,
    pt_seeds, ln_seeds,
    batch_counter: jnp.ndarray,  # () int32
    fx, fy, cx, cy,
    *,
    specs,
    update_pt_seeds: bool,
    update_ln_seeds: bool,
    max_seed_kfs: int,
    sigma_conv_factor: float,
    n_pyr_seed: int,
    emit_next: bool = False,
    frame_id=None,  # () int32, required when emit_next
    pt_width=None,  # static: live-prefix width of the point-seed table
    ln_width=None,  # static: live-prefix width of the line-seed table
    **kw,
) -> FullStepResult:
    """The COMPLETE tracked-frame device program: align -> reproject ->
    pose opt -> structure opt -> depth-filter seed updates, one executable,
    one fetch. The seed update consumes the pose-optimized camera, matching
    the staged order (frame_handler_mono.cpp:353-357 hands the tracked
    frame to the depth filter after pose/structure optimization); on
    keyframes the host initializes NEW seeds after this step, i.e. the
    reference's updateSeeds-then-initializeSeeds order
    (depth_filter.cpp:256-258)."""
    (pt_uv, pt_f, pt_depth, pt_valid, seg_suv, seg_euv, seg_sf, seg_ef,
     seg_sdepth, seg_edepth, seg_valid, R_last, t_last,
     pt_last_optim, ln_last_optim) = unpack_blob(blob, specs)
    last = LastFrameTables(
        pt_uv=pt_uv, pt_f=pt_f, pt_depth=pt_depth, pt_valid=pt_valid,
        seg_suv=seg_suv, seg_euv=seg_euv, seg_sf=seg_sf, seg_ef=seg_ef,
        seg_sdepth=seg_sdepth, seg_edepth=seg_edepth, seg_valid=seg_valid)
    return _track_frame_step_impl(
        last_pyr, cur_pyr, kf_pyr, last, R_last, t_last,
        pt_last_optim, ln_last_optim, mt, pt_seeds, ln_seeds,
        batch_counter, fx, fy, cx, cy,
        update_pt_seeds=update_pt_seeds, update_ln_seeds=update_ln_seeds,
        max_seed_kfs=max_seed_kfs, sigma_conv_factor=sigma_conv_factor,
        n_pyr_seed=n_pyr_seed, emit_next=emit_next, frame_id=frame_id,
        pt_width=pt_width, ln_width=ln_width, **kw)


@partial(jax.jit, static_argnames=(
    "n_levels",
    "update_pt_seeds", "update_ln_seeds", "max_seed_kfs",
    "seed_search_budget", "n_epi_steps", "seed_work_budget", "sigma_conv_factor", "n_pyr_seed", "emit_next", "pt_width", "ln_width",
    "levels", "n_iter_align", "patch_align", "cell_size",
    "cell_size_segs", "max_pts_out", "max_segs_out", "n_line_samples",
    "poseopt_iters", "poseopt_iters_ref", "poseopt_thresh", "n_pyr_use", "has_ls", "has_edgelets", "n_struct_pts",
    "n_struct_segs", "struct_iters"))
def track_frame_step_tables(
    cur_img,  # RAW image (H,W) any dtype — pyramid built IN-GRAPH
    kf_pyr,
    nxt: "NextFrameInputs",  # device-resident (produced by the PREVIOUS
    #                          step); nxt.pyr is the last frame's pyramid
    mt: MapTables,  # device-resident CARRY (previous step's .mt output)
    pt_seeds, ln_seeds,
    batch_counter,
    fx, fy, cx, cy,
    *,
    n_levels: int,
    frame_id,
    mt_delta=None,  # flat f32 host blob (MapState.pack_mt_deltas) or None
    **kw,
) -> FullStepResult:
    """Pipelined-mode step: align inputs come from the previous step's
    device-resident NextFrameInputs (including its pyramid), the map
    tables from the previous step's carry + this frame's host delta blob,
    and the pyramid is built in-graph from the raw image — the only
    host->device traffic per frame is ONE image and ONE small delta blob,
    and the whole frame is ONE dispatch."""
    from plsvo_tpu.image import _build_pyramid_jit

    if mt_delta is not None:
        mt = apply_mt_deltas(mt, mt_delta)
    cur_pyr = _build_pyramid_jit(cur_img.astype(jnp.float32), n_levels)
    return _track_frame_step_impl(
        nxt.pyr, cur_pyr, kf_pyr, nxt.last, nxt.R_last, nxt.t_last,
        nxt.pt_last_optim, nxt.ln_last_optim, mt, pt_seeds, ln_seeds,
        batch_counter, fx, fy, cx, cy, emit_next=True, frame_id=frame_id,
        **kw)


def _track_frame_step_impl(
    last_pyr, cur_pyr, kf_pyr,
    last: LastFrameTables, R_last, t_last,
    pt_last_optim, ln_last_optim,
    mt: MapTables,
    pt_seeds, ln_seeds,
    batch_counter,
    fx, fy, cx, cy,
    *,
    update_pt_seeds: bool,
    update_ln_seeds: bool,
    max_seed_kfs: int,
    sigma_conv_factor: float,
    n_pyr_seed: int,
    emit_next: bool,
    frame_id,
    pt_width=None,
    ln_width=None,
    seed_search_budget: int = 0,
    n_epi_steps: int = 64,
    seed_work_budget: int = 0,
    **kw,
) -> FullStepResult:
    from plsvo_tpu.ops import depth_filter as df

    res = track_frame_core(
        last_pyr, cur_pyr, kf_pyr, last, R_last, t_last, mt,
        pt_last_optim, ln_last_optim, fx, fy, cx, cy, **kw)

    # keyframe poses cam->world for the seed anchors
    R_w_kf = jnp.swapaxes(mt.kf_R, -1, -2)
    t_w_kf = -jnp.einsum("kji,kj->ki", mt.kf_R, mt.kf_t)
    R_w_cur = res.R_f_w.T
    t_w_cur = -res.R_f_w.T @ res.t_f_w
    from plsvo_tpu.image import FlatAtlas

    # kf_pyr is either a pre-packed FlatAtlas (hot path: MapState cache,
    # already built for the seed levels) or a raw level list (tests)
    kf_seed = kf_pyr if isinstance(kf_pyr, FlatAtlas) else kf_pyr[:n_pyr_seed]
    seed_pyrs = (kf_seed, cur_pyr[:n_pyr_seed])
    skw = dict(max_seed_kfs=max_seed_kfs,
               sigma_conv_factor=sigma_conv_factor,
               max_search=seed_search_budget,
               n_epi_steps=n_epi_steps,
               pt_work=seed_work_budget)

    # seed tables are processed only up to the live prefix (free slots are
    # allocated lowest-first, so alive rows cluster at the front; the host
    # picks pt_width/ln_width from its alive mirror) — the epipolar search
    # cost scales with the processed width, not the capacity. Outputs are
    # padded back to capacity so the host path is width-agnostic.
    # Point seeds and both line-seed endpoints go through ONE combined
    # pipeline (df.update_seeds_combined) — one warp/search/align kernel
    # chain instead of three.
    pt_conv = None
    ln_conv = None
    if update_pt_seeds or update_ln_seeds:
        Wp = (pt_width or pt_seeds.mu.shape[0]) if update_pt_seeds else 0
        Wl = (ln_width or ln_seeds.mu_s.shape[0]) if update_ln_seeds else 0
        sub_pt = (jax.tree.map(lambda a: a[:Wp], pt_seeds)
                  if update_pt_seeds else None)
        sub_ln = (jax.tree.map(lambda a: a[:Wl], ln_seeds)
                  if update_ln_seeds else None)
        pres, lres = df.update_seeds_combined(
            sub_pt, sub_ln, R_w_kf, t_w_kf, *seed_pyrs, R_w_cur, t_w_cur,
            fx, fy, cx, cy, batch_counter,
            has_pt=update_pt_seeds, has_ln=update_ln_seeds, **skw)
        K = CONV_BUDGET
        if update_pt_seeds:
            tail_alive = pt_seeds.alive[Wp:]
            pt_seeds = jax.tree.map(
                lambda new, old: jnp.concatenate([new, old[Wp:]]),
                pres.seeds, pt_seeds)
            cap = pt_seeds.mu.shape[0]
            alive_full = jnp.concatenate([pres.seeds.alive, tail_alive])
            # compact: converged rows live in [0, Wp); report row ids +
            # depths instead of capacity-wide masks (~10x less wire)
            (rows,) = jnp.nonzero(pres.converged, size=K, fill_value=cap)
            pt_conv = (
                rows.astype(jnp.int32),
                pres.depth_converged[jnp.minimum(rows, Wp - 1)],
                jnp.sum(pres.converged).astype(jnp.int32),
                pack_bits16(alive_full),
                jnp.sum(pres.skipped).astype(jnp.int32))
        if update_ln_seeds:
            tail_alive = ln_seeds.alive[Wl:]
            ln_seeds = jax.tree.map(
                lambda new, old: jnp.concatenate([new, old[Wl:]]),
                lres.seeds, ln_seeds)
            lcap = ln_seeds.mu_s.shape[0]
            lalive_full = jnp.concatenate([lres.seeds.alive, tail_alive])
            (lrows,) = jnp.nonzero(lres.converged, size=K, fill_value=lcap)
            ln_conv = (
                lrows.astype(jnp.int32),
                lres.depth_s[jnp.minimum(lrows, Wl - 1)],
                lres.depth_e[jnp.minimum(lrows, Wl - 1)],
                jnp.sum(lres.converged).astype(jnp.int32),
                pack_bits16(lalive_full),
                jnp.sum(lres.skipped).astype(jnp.int32))

    nxt = None
    if emit_next:
        nxt = build_next_inputs(res, mt, pt_last_optim, ln_last_optim,
                                frame_id, cur_pyr=cur_pyr)

    return FullStepResult(fused=res, pt_seeds=pt_seeds, ln_seeds=ln_seeds,
                          pt_conv=pt_conv, ln_conv=ln_conv, next=nxt,
                          mt=apply_struct_to_mt(mt, res))


@partial(jax.jit, static_argnames=(
    "mesh", "mesh_axis",
    "specs", "update_pt_seeds", "update_ln_seeds", "max_seed_kfs",
    "seed_search_budget", "n_epi_steps", "seed_work_budget",
    "sigma_conv_factor", "n_pyr_seed", "emit_next", "pt_width", "ln_width",
    "levels", "n_iter_align", "patch_align", "cell_size",
    "cell_size_segs", "max_pts_out", "max_segs_out", "n_line_samples",
    "poseopt_iters", "poseopt_iters_ref", "poseopt_thresh", "n_pyr_use", "has_ls", "has_edgelets", "n_struct_pts",
    "n_struct_segs", "struct_iters"))
def track_frame_step_list(
    per_seq_inputs,  # tuple over sequences of (last_pyr, cur_pyr, kf_pyr,
    #                  blob, mt, batch_counter) pytrees — stacked INSIDE jit
    pt_seeds_stacked,  # PointSeeds with leading batch axis (device-resident)
    ln_seeds_stacked,  # LineSeeds with leading batch axis
    fx, fy, cx, cy,
    *,
    mesh=None,
    mesh_axis: str = "seq",
    frame_ids=None,  # tuple of per-seq () int32, required when emit_next
    **kw,
) -> FullStepResult:
    """Batched multi-sequence frame step. The per-sequence inputs arrive as
    SEPARATE pytrees and are stacked inside the jit: eager jnp.stack calls
    cost ~0.8 ms launch overhead each over the device tunnel, and a frame
    step has ~60 input arrays — stacking in-graph makes them free. Seed
    tables stay stacked across frames (BatchedVO holds them). With a mesh,
    the batch axis is SHARD-MAPPED over it: each device runs the
    collective-free local program on its B/n_dev sequences (pure data
    parallelism over sequences — BASELINE.json config 4).

    shard_map, NOT with_sharding_constraint: letting GSPMD partition the
    vmapped step inserted 700+ collectives — every early-exit
    `jnp.any(...)` while-loop condition became a per-GN-iteration
    cross-device all-reduce over the batch, and spatial resharding of the
    pyramid intermediates added all-to-alls. shard_map keeps the loop
    conditions device-local (union of the LOCAL shard's iteration counts
    only) and admits no communication at all."""
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *per_seq_inputs)
    last_pyr, cur_pyr, kf_pyr, blob, mt, batch_counter = stacked
    # frame_id is a traced operand only read when emit_next; batch_counter
    # stands in as a dummy when the caller doesn't chain
    fids = (batch_counter if frame_ids is None
            else jnp.stack([jnp.asarray(f, jnp.int32) for f in frame_ids]))

    def step(last_pyr, cur_pyr, kf_pyr, blob, mt, pt_seeds, ln_seeds, bc,
             fid):
        return track_frame_step(
            last_pyr, cur_pyr, kf_pyr, blob, mt, pt_seeds, ln_seeds, bc,
            fx, fy, cx, cy, frame_id=fid, **kw)

    vstep = jax.vmap(step)
    host_args = (last_pyr, cur_pyr, kf_pyr, blob, mt, batch_counter, fids)
    if mesh is None:
        return vstep(last_pyr, cur_pyr, kf_pyr, blob, mt,
                     pt_seeds_stacked, ln_seeds_stacked, batch_counter,
                     fids)
    return _shard_mapped_step(vstep, mesh, mesh_axis, host_args,
                              pt_seeds_stacked, ln_seeds_stacked)


@partial(jax.jit, static_argnames=(
    "mesh", "mesh_axis", "n_levels",
    "update_pt_seeds", "update_ln_seeds", "max_seed_kfs",
    "seed_search_budget", "n_epi_steps", "seed_work_budget", "sigma_conv_factor", "n_pyr_seed", "pt_width", "ln_width",
    "levels", "n_iter_align", "patch_align", "cell_size",
    "cell_size_segs", "max_pts_out", "max_segs_out", "n_line_samples",
    "poseopt_iters", "poseopt_iters_ref", "poseopt_thresh", "n_pyr_use", "has_ls", "has_edgelets", "n_struct_pts",
    "n_struct_segs", "struct_iters"))
def track_frame_step_tables_list(
    per_seq_inputs,  # tuple over sequences of (kf_pyr,) — stacked IN jit
    cur_imgs,  # (B, H, W) RAW images, ONE stacked host upload
    bc_fid,  # (B, 2) int32 [batch_counter, frame_id], ONE stacked upload
    nxt_stacked,  # NextFrameInputs with leading batch axis (device-resident,
    #               emitted by the previous batched step; .pyr = last pyrs)
    mt_stacked,  # MapTables CARRY with leading batch axis (previous .mt)
    mt_delta_stacked,  # (B, mt_delta_len) host delta blobs — ONE upload
    pt_seeds_stacked,
    ln_seeds_stacked,
    fx, fy, cx, cy,
    *,
    n_levels: int,
    mesh=None,
    mesh_axis: str = "seq",
    **kw,
) -> FullStepResult:
    """Pipelined batched step: align inputs chain from the previous batched
    step's device-resident NextFrameInputs (incl. pyramids), map tables
    from the previous step's stacked CARRY + one (B, L) host delta upload,
    pyramids built in-graph from ONE stacked image upload — the entire
    per-frame host->device traffic for B sequences is 3 uploads and ONE
    dispatch (the r4 path paid ~8 image uploads + 8 pyramid dispatches +
    2x8 scalar uploads + per-KF full-table re-upload storms; VERDICT r4
    next #1). With a mesh, shard-mapped over the sequence axis (see
    track_frame_step_list for why shard_map and not a sharding
    constraint)."""
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *per_seq_inputs)
    (kf_pyr,) = stacked

    def step(kf_pyr, img, bcf, delta, nxt, mt, pt_seeds, ln_seeds):
        return track_frame_step_tables(
            img, kf_pyr, nxt, mt, pt_seeds, ln_seeds, bcf[0],
            fx, fy, cx, cy, n_levels=n_levels, frame_id=bcf[1],
            mt_delta=delta, **kw)

    if mesh is None:
        return jax.vmap(step)(kf_pyr, cur_imgs, bc_fid, mt_delta_stacked,
                              nxt_stacked, mt_stacked,
                              pt_seeds_stacked, ln_seeds_stacked)
    host_args = (kf_pyr, cur_imgs, bc_fid, mt_delta_stacked)
    return _shard_mapped_step(
        lambda kp, im, bcf, delta, pt_s, ln_s, *extra:
            jax.vmap(step)(kp, im, bcf, delta, extra[0], extra[1],
                           pt_s, ln_s),
        mesh, mesh_axis, host_args, pt_seeds_stacked, ln_seeds_stacked,
        nxt_stacked, mt_stacked, flat_call=True)




def _shard_mapped_step(vstep, mesh, mesh_axis, host_args,
                       pt_seeds_stacked, ln_seeds_stacked, *sharded_extra,
                       flat_call=False):
    """Run the vmapped frame step shard-mapped over `mesh_axis` with ZERO
    communication.

    - shard_map (not a GSPMD sharding constraint): under GSPMD the batched
      step's early-exit `jnp.any` while-loop conditions became
      per-GN-iteration cross-device all-reduces and the pyramid
      intermediates got spatially resharded (700+ collectives observed).
      Inside shard_map every loop condition is device-local.
    - host-uploaded per-seq inputs stay REPLICATED and each device slices
      its own rows locally (in-jit stacking a replicated tuple with a
      sharded output spec lowers to per-level all-to-alls; a local
      dynamic-slice of the replicated stack is comm-free).
    - the device-resident carries (seed tables, NextFrameInputs) are
      already P(mesh_axis)-sharded outputs of the previous step — they pass
      straight through with sharded in_specs.
    """
    spec = jax.sharding.PartitionSpec(mesh_axis)
    rep = jax.sharding.PartitionSpec()
    B = jax.tree.leaves(host_args)[0].shape[0]
    n_shard = mesh.shape[mesh_axis]
    assert B % n_shard == 0, "batch not divisible by mesh axis"
    B_local = B // n_shard

    def body(host_args_l, pt_s, ln_s, *extra):
        idx = jax.lax.axis_index(mesh_axis)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(
            a, idx * B_local, B_local, 0)
        local = jax.tree.map(sl, host_args_l)
        if flat_call:
            return vstep(*local, pt_s, ln_s, *extra)
        return vstep(*local[:5], pt_s, ln_s, *local[5:])

    in_specs = (jax.tree.map(lambda _: rep, host_args),
                jax.tree.map(lambda _: spec, pt_seeds_stacked),
                jax.tree.map(lambda _: spec, ln_seeds_stacked)) + tuple(
        jax.tree.map(lambda _: spec, e) for e in sharded_extra)
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=spec,
        check_vma=False)(host_args, pt_seeds_stacked, ln_seeds_stacked,
                         *sharded_extra)


@partial(jax.jit, static_argnames=(
    "specs", "levels", "n_iter_align", "patch_align", "cell_size",
    "cell_size_segs", "max_pts_out", "max_segs_out", "n_line_samples",
    "poseopt_iters", "poseopt_iters_ref", "poseopt_thresh", "n_pyr_use", "has_ls", "has_edgelets", "n_struct_pts",
    "n_struct_segs", "struct_iters"))
def track_frame_core_blob(
    last_pyr, cur_pyr, kf_pyr,
    blob: jnp.ndarray,  # flat f32 per-frame tables (last_blob_specs layout)
    mt: MapTables,
    fx, fy, cx, cy,
    *,
    specs,
    **kw,
) -> FusedResult:
    """track_frame_core with the per-frame host tables delivered as ONE
    packed upload (see pack_blob_host)."""
    (pt_uv, pt_f, pt_depth, pt_valid, seg_suv, seg_euv, seg_sf, seg_ef,
     seg_sdepth, seg_edepth, seg_valid, R_last, t_last,
     pt_last_optim, ln_last_optim) = unpack_blob(blob, specs)
    last = LastFrameTables(
        pt_uv=pt_uv, pt_f=pt_f, pt_depth=pt_depth, pt_valid=pt_valid,
        seg_suv=seg_suv, seg_euv=seg_euv, seg_sf=seg_sf, seg_ef=seg_ef,
        seg_sdepth=seg_sdepth, seg_edepth=seg_edepth, seg_valid=seg_valid)
    return track_frame_core(
        last_pyr, cur_pyr, kf_pyr, last, R_last, t_last, mt,
        pt_last_optim, ln_last_optim, fx, fy, cx, cy, **kw)
