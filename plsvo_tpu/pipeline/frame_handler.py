"""FrameHandlerMono: the tracking pipeline stage machine.

TPU-native rebuild of FrameHandlerBase/FrameHandlerMono
(reference: src/frame_handler_base.cpp, src/frame_handler_mono.cpp).
Host Python drives the stages; every numeric stage is one jitted batched op:

  addImage (frame_handler_mono.cpp:144-221)
    FIRST  -> detect features, set keyframe            (:223-235)
    SECOND -> KLT + homography bootstrap               (:237-261)
    DEFAULT-> sparse align -> reproject -> pose opt
              -> structure opt -> KF decision          (:263-406)
    RELOC  -> align against closest keyframe           (:408-436)

The depth filter runs synchronously after each frame (the reference uses a
mapping thread + queue, depth_filter.cpp:98-149; one batched dispatch per
frame achieves the same overlap on-device without threads — SURVEY §2.3).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config
from plsvo_tpu.image import build_pyramid
from plsvo_tpu.ops import depth_filter as df
from plsvo_tpu.ops import detection, homography
from plsvo_tpu.ops import klt as klt_ops
from plsvo_tpu.ops import lines as line_ops
from plsvo_tpu.ops import sparse_align
from plsvo_tpu.pipeline.state import (
    FrameState, MapState, ST_CANDIDATE, ST_DELETED, ST_GOOD, ST_UNKNOWN)
from plsvo_tpu.pipeline import fused
from plsvo_tpu.utils.profiling import PerformanceMonitor

STAGE_PAUSED = "paused"
STAGE_FIRST = "first"
STAGE_SECOND = "second"
STAGE_DEFAULT = "default"
STAGE_RELOCALIZING = "relocalizing"

QUALITY_GOOD = "good"
QUALITY_INSUFFICIENT = "insufficient"
QUALITY_BAD = "bad"


@dataclass
class FrameResult:
    frame_id: int
    stage: str
    quality: str
    n_pt_matches: int
    n_seg_matches: int
    is_keyframe: bool
    R_f_w: np.ndarray
    t_f_w: np.ndarray


from functools import partial as _partial


@_partial(jax.jit, static_argnames=(
    "use_pt", "use_ls", "use_edgelets", "n_pyr", "n_pyr_segs", "cell_size",
    "score_threshold", "mag_threshold", "width", "height"))
def _kf_detect_program(pyr, occ_uv, occ_ok, *, use_pt, use_ls,
                       use_edgelets, n_pyr, n_pyr_segs, cell_size,
                       score_threshold, mag_threshold, width, height):
    """The WHOLE keyframe seed-detection device program (FAST grid +
    edgelets + tiled line segments + cell occupancy) as ONE dispatch —
    the separate jitted calls cost ~4 op launches per keyframe, which
    serialize across B sequences inside the batched drain windows."""
    if use_pt:
        grid = detection.detect_fast_grid(
            pyr[:n_pyr], cell_size=cell_size,
            score_threshold=score_threshold)
    else:
        _, _, n_cells = detection.grid_cells(width, height, cell_size)
        grid = detection.CornerGrid(
            uv=jnp.zeros((n_cells, 2), jnp.float32),
            level=jnp.zeros(n_cells, jnp.int32),
            score=jnp.zeros(n_cells, jnp.float32),
            valid=jnp.zeros(n_cells, bool))
    egrid = None
    if use_pt and use_edgelets:
        egrid = detection.detect_edgelets_grid(
            pyr[0], cell_size=cell_size, mag_threshold=mag_threshold)
    segs = None
    if use_ls:
        parts = []
        for lvl in range(n_pyr_segs):
            det = line_ops.detect_segments_tiled(
                pyr[lvl], n_peaks=64, run_gap_px=3.0, dist_tol=1.2)
            if lvl:
                s = float(1 << lvl)
                det = det._replace(sp=det.sp * s, ep=det.ep * s,
                                   length=det.length * s)
            parts.append(det)
        segs = (parts[0] if len(parts) == 1 else line_ops.SegmentTable(
            *[jnp.concatenate(xs) for xs in zip(*parts)]))
    occupied = detection.occupancy_from_positions(
        occ_uv, occ_ok, width, height, cell_size)
    return grid, segs, occupied, egrid


@_partial(jax.jit, static_argnames=(
    "use_pt", "use_ls", "use_edgelets", "n_pyr", "n_pyr_segs", "cell_size",
    "score_threshold", "mag_threshold", "width", "height"))
def _kf_detect_program_batched(pyrs, occ_uv, occ_ok, **statics):
    """_kf_detect_program over R stacked keyframe requests in ONE
    dispatch: the batched drain runs one padded program per window instead
    of one ~6.5 ms program per sequence's keyframe (VERDICT r4 next #1 —
    batch the per-KF device path across sequences). UNROLLED over the
    batch, not vmapped: the Pallas FAST kernel's TPU lowering rejects the
    batched BlockSpec a vmap would add; unrolling keeps the single-request
    kernels verbatim inside one executable (no host round-trips, which is
    what the batching is for)."""
    R = pyrs[0].shape[0]
    outs = [_kf_detect_program.__wrapped__(
        tuple(p[r] for p in pyrs), occ_uv[r], occ_ok[r], **statics)
        for r in range(R)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)


class FrameHandlerMono:
    """Single-camera pipeline (reference: FrameHandlerMono)."""

    def __init__(self, cam: PinholeCamera, cfg: Config = None):
        self.cam = cam
        self.cfg = cfg or Config()
        pl = self.cfg.pipeline
        self.n_levels = max(pl.n_pyr_levels, pl.klt_max_level + 1)
        self.stage = STAGE_FIRST
        self.map = MapState(self.cfg, self.n_levels, (cam.height, cam.width),
                            intrinsics=(float(np.asarray(cam.fx)),
                                        float(np.asarray(cam.fy)),
                                        float(np.asarray(cam.cx)),
                                        float(np.asarray(cam.cy))))
        self.frame_id = 0
        self.last_frame: Optional[FrameState] = None
        self.first_frame: Optional[FrameState] = None
        self._first_uv = None
        self.pt_seeds = df.empty_point_seeds(self.cfg.caps.max_seeds)
        self.ln_seeds = df.empty_line_seeds(self.cfg.caps.max_seed_segs)
        self.batch_counter = 0
        self.n_relocalizations = 0
        self.results: List[FrameResult] = []
        self._fx = float(np.asarray(cam.fx))
        self._fy = float(np.asarray(cam.fy))
        self._cx = float(np.asarray(cam.cx))
        self._cy = float(np.asarray(cam.cy))
        # host mirrors of the static seed columns (written only by
        # _init_seeds) so harvesting never fetches the device tables
        caps = self.cfg.caps
        self._seed_host = {
            "kf_idx": np.zeros(caps.max_seeds, np.int32),
            "uv": np.zeros((caps.max_seeds, 2), np.float32),
            "f": np.zeros((caps.max_seeds, 3), np.float32),
            "level": np.zeros(caps.max_seeds, np.int32),
            "type": np.zeros(caps.max_seeds, np.int32),
            "dir": np.zeros((caps.max_seeds, 2), np.float32)}
        self._lnseed_host = {
            "kf_idx": np.zeros(caps.max_seed_segs, np.int32),
            "s_uv": np.zeros((caps.max_seed_segs, 2), np.float32),
            "e_uv": np.zeros((caps.max_seed_segs, 2), np.float32),
            "sf": np.zeros((caps.max_seed_segs, 3), np.float32),
            "ef": np.zeros((caps.max_seed_segs, 3), np.float32),
            "level": np.zeros(caps.max_seed_segs, np.int32)}
        self._any_line_seeds = False
        self._pt_converged_dev = None
        self._ln_converged_dev = None
        self._seed_alive = np.zeros(caps.max_seeds, bool)
        self._lnseed_alive = np.zeros(caps.max_seed_segs, bool)
        # frame counter at each row's last INSTALL: an in-flight step
        # dispatched BEFORE the install returns alive-masks that predate
        # these rows — the stamps let _apply_harvest keep the mirror's
        # truth for them instead of marking fresh seeds dead (the r4/r5
        # "seed-accounting transient")
        self._seed_install_frame = np.full(caps.max_seeds, -1, np.int64)
        self._lnseed_install_frame = np.full(caps.max_seed_segs, -1,
                                             np.int64)
        # convergence results arrive in full-table row space (the fused
        # step updates seeds at capacity); identity mapping by default
        self._pt_rows = np.arange(caps.max_seeds)
        self._ln_rows = np.arange(caps.max_seed_segs)
        # device-resident MapTables carry (pipelined mode): struct-opt is
        # applied in-graph, host-initiated map changes ride a per-frame
        # delta blob — no per-frame table uploads (fused.apply_mt_deltas)
        self._mt_carry = None
        # pipelined-mode in-flight frames [(FrameState, FullStepResult)]
        # + in-flight fetch windows + finished results awaiting delivery
        # + deferred KF seed inits
        self._pipe_q: List = []
        self._fetch_q: List = []
        self._ready: List[FrameResult] = []
        self._pending_seed_init: List = []
        # deferred windowed-localBA results [(future, meta, ba_meta)]
        self._pending_ba: List = []
        # BatchedVO control: _force_sync routes stray per-seq frames through
        # the synchronous path; _defer_seed_init makes keyframe seed
        # detection fetch-deferred even then (the batch runner folds the
        # fetch into its own drain window)
        self._force_sync = False
        self._defer_seed_init = False
        # trace plane (reference permon channels, frame_handler_base.cpp:58-86)
        self.permon = PerformanceMonitor()

    # ---- host-side (numpy) camera math: avoids device round-trips ----
    def _np_unproject(self, uv: np.ndarray) -> np.ndarray:
        x = (uv[..., 0] - self._cx) / self._fx
        y = (uv[..., 1] - self._cy) / self._fy
        fvec = np.stack([x, y, np.ones_like(x)], -1)
        return (fvec / np.linalg.norm(fvec, axis=-1, keepdims=True)).astype(np.float32)

    @staticmethod
    def _np_line_coeffs(sf: np.ndarray, ef: np.ndarray) -> np.ndarray:
        zs = np.where(np.abs(sf[..., 2:3]) < 1e-10, 1e-10, sf[..., 2:3])
        ze = np.where(np.abs(ef[..., 2:3]) < 1e-10, 1e-10, ef[..., 2:3])
        sp = np.concatenate([sf[..., :2] / zs, np.ones_like(zs)], -1)
        ep = np.concatenate([ef[..., :2] / ze, np.ones_like(ze)], -1)
        l = np.cross(sp, ep)
        n = np.linalg.norm(l[..., :2], axis=-1, keepdims=True)
        return (l / np.maximum(n, 1e-12)).astype(np.float32)

    # ------------------------------------------------------------------
    def add_image(self, img, timestamp: float) -> FrameResult:
        self.permon.new_frame(self.frame_id)
        t_tot = time.perf_counter()
        pipe = (self.stage == STAGE_DEFAULT and self.cfg.pipeline.pipelined
                and not self._force_sync)
        with self.permon.timer("pyramid_creation"):
            if isinstance(img, jnp.ndarray):
                img_dev = img if pipe else img.astype(jnp.float32)
            else:
                # upload as uint8 when possible (4x less tunnel bandwidth)
                a = np.asarray(img)
                if a.dtype != np.uint8 and a.dtype != np.float32:
                    a = a.astype(np.float32)
                img_dev = jnp.asarray(a)
                if not pipe:
                    img_dev = img_dev.astype(jnp.float32)
            # pipelined DEFAULT frames build their pyramid IN-GRAPH inside
            # the chained step (one dispatch, one upload); every other
            # path builds it here
            pyr = None if pipe else build_pyramid(img_dev, self.n_levels)
        if self.stage == STAGE_FIRST:
            res = self._process_first(pyr, timestamp)
        elif self.stage == STAGE_SECOND:
            res = self._process_second(pyr, timestamp)
        elif self.stage == STAGE_DEFAULT:
            # (pending seed harvest is folded into the fused-core sync)
            res = (self._process_frame_pipelined(img_dev, timestamp)
                   if pipe else self._process_frame(pyr, timestamp))
        elif self.stage == STAGE_RELOCALIZING:
            self._harvest_seeds()
            res = self._relocalize(pyr, timestamp)
        else:
            raise RuntimeError(f"stage {self.stage}")
        self.frame_id += 1
        self.permon.timers["tot_time"] = time.perf_counter() - t_tot
        if res is not None:  # None = pipelined mode's fill frame
            self.results.append(res)
            self.permon.log("img_align_n_tracked", res.n_pt_matches)
            self.permon.log("n_seg_tracked", res.n_seg_matches)
        return res

    # ------------------------------------------------------------------
    def _detect_features(self, pyr, use_pt: bool = None, use_ls: bool = None):
        """FAST grid corners + line segments with shared occupancy
        (reference: initialization::detectFeatures, initialization.cpp:125-168
        and FrameHandlerMono detector wiring, frame_handler_mono.cpp:63-137).
        use_pt/use_ls override the class toggles for the bootstrap's
        init_pt/init_ls (initialization.cpp:133-140)."""
        pl = self.cfg.pipeline
        if use_pt is None:
            use_pt = pl.has_pt
        if use_ls is None:
            use_ls = pl.has_ls
        if use_pt:
            grid = detection.detect_fast_grid(
                pyr[: pl.n_pyr_levels], cell_size=pl.grid_size,
                score_threshold=pl.triang_min_corner_score)
        else:
            # no-op point detector (reference: has_pt=false swaps in the
            # abstract no-op detector, frame_handler_mono.cpp:101-113)
            from plsvo_tpu.ops.detection import grid_cells

            _, _, n_cells = grid_cells(self.cam.width, self.cam.height,
                                       pl.grid_size)
            grid = detection.CornerGrid(
                uv=jnp.zeros((n_cells, 2), jnp.float32),
                level=jnp.zeros(n_cells, jnp.int32),
                score=jnp.zeros(n_cells, jnp.float32),
                valid=jnp.zeros(n_cells, bool))
        egrid = None
        if use_pt and pl.use_edgelets:
            egrid = detection.detect_edgelets_grid(
                pyr[0], cell_size=pl.grid_size,
                mag_threshold=pl.edgelet_grad_thresh)
        segs = None
        if use_ls:
            # per-level tiled detection (reference: LsdDetector detects per
            # pyramid level and scales endpoints by the octave,
            # feature_detection.cpp:155-179; default n_pyr_levels_segs=1 =
            # full-res only, config.cpp:89). The tiled pass recovers the
            # short/medium segments a single global Hough buries.
            # NOTE: returns the RAW candidate table — the greedy grid dedup
            # runs on HOST after the fetch (_dedup_segments_host): as a
            # lax.scan it cost ~2 ms of device time per keyframe.
            parts = []
            for lvl in range(pl.n_pyr_levels_segs):
                det = line_ops.detect_segments_tiled(
                    pyr[lvl], n_peaks=64, run_gap_px=3.0, dist_tol=1.2)
                if lvl:
                    s = float(1 << lvl)
                    det = det._replace(sp=det.sp * s, ep=det.ep * s,
                                       length=det.length * s)
                parts.append(det)
            segs = (parts[0] if len(parts) == 1 else line_ops.SegmentTable(
                *[jnp.concatenate(xs) for xs in zip(*parts)]))
        return grid, segs, egrid

    def _dedup_segments_host(self, det) -> "line_ops.SegmentTable":
        """Grid dedup of a FETCHED raw candidate table (numpy)."""
        pl = self.cfg.pipeline
        W, H = self.cam.width, self.cam.height
        # reference length gate: lsd_min_length * H*W/(H+W)
        # (feature_detection.cpp:154) — ~44 px at 752x480
        min_len = pl.lsd_min_length * (W * H) / (W + H)
        return line_ops.dedup_segments_grid_np(
            det, width=W, height=H, cell_size=pl.grid_size_segs,
            max_segs=self.cfg.caps.max_segs, min_length=min_len)

    def _process_first(self, pyr, ts) -> FrameResult:
        frame = FrameState.empty(self.cfg, self.frame_id, ts, pyr,
                                 np.eye(3, dtype=np.float32),
                                 np.zeros(3, np.float32))
        grid, segs, _ = self._detect_features(
            pyr, use_pt=self.cfg.pipeline.has_pt and self.cfg.pipeline.init_pt,
            use_ls=self.cfg.pipeline.has_ls and self.cfg.pipeline.init_ls)
        uv = np.asarray(grid.uv)
        valid = np.asarray(grid.valid)
        klt_targets = [uv[valid]]
        if segs is not None:
            segs = self._dedup_segments_host(segs)
            sv = np.asarray(segs.valid)
            sp, ep = np.asarray(segs.sp)[sv], np.asarray(segs.ep)[sv]
            # each segment contributes KLT targets sampled along it
            # (reference: start/mid/end, initialization.cpp:158-167). In
            # line-only mode segments are the ONLY target source, so sample
            # quarter points too — a denser bootstrap map stabilizes the
            # pose until the first line seeds converge
            alphas = ((0.0, 0.25, 0.5, 0.75, 1.0)
                      if not self.cfg.pipeline.has_pt else (0.0, 0.5, 1.0))
            klt_targets += [sp + a * (ep - sp) for a in alphas]
        targets = np.concatenate(klt_targets, 0) if klt_targets else np.zeros((0, 2))
        if len(targets) < self.cfg.pipeline.init_min_fts:  # initialization.cpp:44
            return FrameResult(frame.frame_id, self.stage, QUALITY_INSUFFICIENT,
                               0, 0, False, frame.R_f_w, frame.t_f_w)
        cap = self.cfg.caps.max_klt_fts
        # fixed-capacity KLT target table (variable lengths would recompile
        # the KLT tracker on every bootstrap attempt)
        n = min(len(targets), cap)
        self._first_uv = np.zeros((cap, 2), np.float32)
        self._first_uv[:n] = targets[:n]
        self._first_ok = np.zeros(cap, bool)
        self._first_ok[:n] = True
        self.first_frame = frame
        frame.is_keyframe = True
        self.stage = STAGE_SECOND
        return FrameResult(frame.frame_id, STAGE_FIRST, QUALITY_GOOD,
                           int(self._first_ok.sum()), 0, True,
                           frame.R_f_w, frame.t_f_w)

    def _process_second(self, pyr, ts) -> FrameResult:
        pl = self.cfg.pipeline
        uv0 = self._first_uv
        uv_cur, ok, disp = klt_ops.track_klt(
            self.first_frame.pyr, pyr, jnp.asarray(uv0),
            jnp.asarray(self._first_ok))
        ok = np.asarray(ok) & self._first_ok
        disp_med = float(np.median(np.asarray(disp)[ok])) if ok.any() else 0.0
        fail = FrameResult(self.frame_id, self.stage, QUALITY_INSUFFICIENT, 0, 0,
                           False, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        if ok.sum() < pl.init_min_tracked:
            self._reset()
            return fail
        if disp_med < pl.init_min_disparity:
            return fail  # wait for more parallax (initialization.cpp:62-69)
        f_ref = np.asarray(self.cam.unproject(jnp.asarray(uv0)))
        f_cur = np.asarray(self.cam.unproject(uv_cur))
        hres = homography.homography_init(
            f_ref, f_cur, ok, focal=self._fx,
            reproj_thresh_px=pl.reproj_thresh, min_inliers=pl.init_min_inliers)
        if not hres.ok or hres.inliers.sum() < pl.init_min_inliers:
            self._reset()
            return fail

        # scale map so median triangulated depth = map_scale
        # (initialization.cpp:84-91)
        m = hres.inliers & (hres.depths_ref > 1e-6)
        z_med = float(np.median(hres.depths_ref[m] * f_ref[m][:, 2]))
        scale = pl.map_scale / z_med
        R_cr = hres.R_cur_ref.astype(np.float32)
        t_cr = (hres.t_cur_ref * scale).astype(np.float32)

        frame = FrameState.empty(self.cfg, self.frame_id, ts, pyr, R_cr, t_cr)
        frame.is_keyframe = True

        # install both keyframes and the triangulated points
        kf0 = self.map.add_keyframe(self.first_frame)
        uv_cur_np = np.asarray(uv_cur)
        rows = np.where(m)[0][: self.cfg.caps.max_fts]
        n_pts = 0
        for i in rows:
            pos_w = f_ref[i] * (hres.depths_ref[i] * scale)  # world = first frame
            lm = self.map.new_point(pos_w, kf0, uv0[i], f_ref[i], 0)
            if lm < 0:
                break
            # the second frame observes it too
            frame.pt_uv[n_pts] = uv_cur_np[i]
            frame.pt_f[n_pts] = f_cur[i]
            frame.pt_level[n_pts] = 0
            frame.pt_lm[n_pts] = lm
            frame.pt_valid[n_pts] = True
            # also register in kf0's table
            self.map.kf_pt_uv[kf0, n_pts] = uv0[i]
            self.map.kf_pt_f[kf0, n_pts] = f_ref[i]
            self.map.kf_pt_lm[kf0, n_pts] = lm
            n_pts += 1

        self.map.add_keyframe(frame)
        d_mean, d_min = self.map.scene_depth(frame)
        self._init_seeds(frame, d_mean, max(d_min * 0.5, 1e-3))
        self.last_frame = frame
        self.stage = STAGE_DEFAULT
        return FrameResult(frame.frame_id, STAGE_SECOND, QUALITY_GOOD,
                           n_pts, 0, True, R_cr, t_cr)

    # ------------------------------------------------------------------
    def _align_inputs_from_frame(self, frame: FrameState):
        """Build sparse-align tables from the last frame's features
        (depths recomputed against landmark positions, as the reference does
        at sparse_img_align.cpp:230-232)."""
        caps = self.cfg.caps
        center = frame.cam_center_w()
        F = caps.max_fts
        pv = frame.pt_valid & (frame.pt_lm >= 0)
        lm = np.where(pv, frame.pt_lm, 0)
        alive_lm = pv & (self.map.pt_status[lm] > 0)
        depth = np.linalg.norm(self.map.pt_pos[lm] - center[None], axis=-1)
        pts = sparse_align.AlignPoints(
            xyz_ref=jnp.asarray(frame.pt_f * depth[:, None], jnp.float32),
            uv_ref=jnp.asarray(frame.pt_uv, jnp.float32),
            valid=jnp.asarray(alive_lm))

        sv = frame.seg_valid & (frame.seg_lm >= 0)
        slm = np.where(sv, frame.seg_lm, 0)
        alive_s = sv & (self.map.ln_status[slm] > 0)
        s_depth = np.linalg.norm(self.map.ln_spos[slm] - center[None], axis=-1)
        e_depth = np.linalg.norm(self.map.ln_epos[slm] - center[None], axis=-1)
        segs = sparse_align.make_align_segments(
            jnp.asarray(frame.seg_suv), jnp.asarray(frame.seg_euv),
            jnp.asarray(frame.seg_sf), jnp.asarray(frame.seg_ef),
            jnp.asarray(s_depth, jnp.float32), jnp.asarray(e_depth, jnp.float32),
            jnp.asarray(alive_s), n_samples=caps.n_line_samples,
            fx=self.cam.fx, fy=self.cam.fy, cx=self.cam.cx, cy=self.cam.cy)
        return pts, segs

    def _last_blob(self, frame: FrameState) -> jnp.ndarray:
        """ONE packed upload of the per-frame host tables: last frame's
        feature tables (landmark ranges recomputed as the reference does at
        sparse_img_align.cpp:230-232), its pose, and the last-optimized
        stamps (layout: fused.last_blob_specs)."""
        m = self.map
        center = frame.cam_center_w()
        pv = frame.pt_valid & (frame.pt_lm >= 0)
        lm = np.where(pv, frame.pt_lm, 0)
        alive = pv & (m.pt_status[lm] > 0)
        depth = np.linalg.norm(m.pt_pos[lm] - center[None], axis=-1)
        sv = frame.seg_valid & (frame.seg_lm >= 0)
        slm = np.where(sv, frame.seg_lm, 0)
        alive_s = sv & (m.ln_status[slm] > 0)
        sd = np.linalg.norm(m.ln_spos[slm] - center[None], axis=-1)
        ed = np.linalg.norm(m.ln_epos[slm] - center[None], axis=-1)
        blob = fused.pack_blob_host([
            frame.pt_uv, frame.pt_f, depth, alive,
            frame.seg_suv, frame.seg_euv, frame.seg_sf, frame.seg_ef,
            sd, ed, alive_s, frame.R_f_w, frame.t_f_w,
            np.clip(m.pt_last_optim, -1, 2**24 - 1),
            np.clip(m.ln_last_optim, -1, 2**24 - 1)])
        return jnp.asarray(blob)

    def _map_tables(self) -> fused.MapTables:
        return fused.map_tables_from_state(self.map)

    def _fused_kwargs(self):
        pl = self.cfg.pipeline
        return dict(
            levels=tuple(range(pl.klt_max_level, pl.klt_min_level - 1, -1)),
            n_iter_align=pl.img_align_n_iter,
            patch_align=pl.img_align_patch_size,
            cell_size=pl.grid_size, cell_size_segs=pl.grid_size_segs,
            max_pts_out=self.cfg.caps.max_fts,
            max_segs_out=self.cfg.caps.max_segs,
            n_line_samples=self.cfg.caps.n_line_samples,
            poseopt_iters=pl.poseoptim_num_iter,
            poseopt_iters_ref=(pl.poseoptim_num_iter_ref
                               if pl.has_refinement else 0),
            poseopt_thresh=pl.poseoptim_thresh,
            n_pyr_use=pl.n_pyr_levels, has_ls=pl.has_ls,
            has_edgelets=pl.use_edgelets and pl.has_pt,
            n_struct_pts=pl.structureoptim_max_pts,
            n_struct_segs=pl.structureoptim_max_segs,
            struct_iters=pl.structureoptim_num_iter)

    def _blob_specs(self):
        caps = self.cfg.caps
        return fused.last_blob_specs(caps.max_fts, caps.max_segs,
                                     caps.max_points, caps.max_lines)

    @staticmethod
    def _live_width(alive: np.ndarray, cap: int, floor: int):
        """Power-of-2 prefix width covering all alive rows (free slots are
        allocated lowest-first so alive rows cluster at the front); None
        when the full capacity is needed (avoids a duplicate jit variant)."""
        idx = np.where(alive)[0]
        hi = int(idx[-1]) + 1 if len(idx) else 0
        w = floor
        while w < hi:
            w *= 2
        return None if w >= cap else w

    def _step_kwargs(self):
        pl = self.cfg.pipeline
        caps = self.cfg.caps
        return dict(
            specs=self._blob_specs(),
            update_pt_seeds=bool(self._seed_alive.any()),
            update_ln_seeds=bool(pl.has_ls and self._any_line_seeds
                                 and self._lnseed_alive.any()),
            max_seed_kfs=pl.max_seed_kfs,
            sigma_conv_factor=pl.seed_convergence_sigma2_thresh,
            seed_search_budget=pl.seed_search_budget,
            n_epi_steps=pl.epi_max_steps,
            seed_work_budget=pl.seed_work_budget,
            n_pyr_seed=pl.n_pyr_levels,
            pt_width=self._live_width(self._seed_alive, caps.max_seeds, 128),
            ln_width=self._live_width(self._lnseed_alive,
                                      caps.max_seed_segs, 64),
            **self._fused_kwargs())

    def _step_inputs(self, pyr):
        last = self.last_frame
        pl = self.cfg.pipeline
        return (
            last.pyr, pyr, self.map.kf_atlas_flat(pl.n_pyr_levels),
            self._last_blob(last), self._map_tables(),
            self.pt_seeds, self.ln_seeds,
            jnp.asarray(self.batch_counter, jnp.int32),
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy)

    def _process_frame(self, pyr, ts) -> FrameResult:
        if self.cfg.pipeline.pipelined and not self._force_sync:
            return self._process_frame_pipelined(pyr, ts)
        last = self.last_frame
        frame = FrameState.empty(self.cfg, self.frame_id, ts, pyr,
                                 last.R_f_w.copy(), last.t_f_w.copy())

        # --- ONE device program: align -> reproject -> pose opt ->
        # structure opt -> seed updates; ONE fetch (seed tables stay on
        # device) ---
        # full (cached/invalidate-refreshed) tables ship each frame in
        # sync mode — drop the redundant carry-delta queue entries
        self.map.mt_mark_clean()
        with self.permon.timer("sparse_img_align"):
            step = fused.track_frame_step(
                *self._step_inputs(pyr), **self._step_kwargs())
        self.pt_seeds = step.pt_seeds
        self.ln_seeds = step.ln_seeds
        with self.permon.timer("reproject"):
            flat, meta = fused.flatpack((fused.fetch_view(step.fused),
                                         step.pt_conv, step.ln_conv))
            res, pt_conv, ln_conv = fused.flatunpack(
                jax.device_get(flat), meta)
        # converged seeds -> candidate landmarks, visible from the NEXT
        # frame's core (asynchronous mapping-thread delivery semantics,
        # depth_filter.cpp:333-355)
        got = tuple(g for g in (pt_conv, ln_conv) if g is not None)
        self._apply_harvest(got, pt_conv is not None, ln_conv is not None,
                            result_frame_id=frame.frame_id)
        return self._post_fused(frame, res)

    # -- pipelined mode ------------------------------------------------
    def _process_frame_pipelined(self, img_or_pyr, ts) \
            -> Optional[FrameResult]:
        """Dispatch frame i BEFORE fetching earlier frames' results: the
        device is never idle, the ~28 ms/fetch wire latency is amortized
        over pipeline_depth frames, and host bookkeeping overlaps device
        compute. Returns finished results with up to pipeline_depth frames
        of delay (None while the pipeline fills).

        Chained frames take the RAW device image — the pyramid is built
        IN-GRAPH by the step and comes back as step.next.pyr, so the only
        per-frame host->device traffic is one image + one delta blob."""
        kwargs = self._step_kwargs()
        pl = self.cfg.pipeline
        common = (self.map.kf_atlas_flat(pl.n_pyr_levels),)
        fid = jnp.asarray(self.frame_id, jnp.int32)
        if self.map._mt_overflow and self._pipe_q:
            # map-wide change (similarity transform): the delta path can't
            # express it — drain and restart the pipeline with a resync
            self._initiate_drain(keep=0)
            while self._fetch_q:
                self._complete_drains(force=True)
        with self.permon.timer("sparse_img_align"):
            if not self._pipe_q:
                # pipeline start: host tables of the last finalized frame;
                # the full map upload IS the carry resync (pending deltas
                # are already contained in it)
                pyr = (img_or_pyr if isinstance(img_or_pyr, (list, tuple))
                       else build_pyramid(img_or_pyr.astype(jnp.float32),
                                          self.n_levels))
                self.map.mt_mark_clean()
                step = fused.track_frame_step(
                    self.last_frame.pyr, pyr, *common,
                    self._last_blob(self.last_frame), self._map_tables(),
                    self.pt_seeds, self.ln_seeds,
                    jnp.asarray(self.batch_counter, jnp.int32),
                    self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                    emit_next=True, frame_id=fid, **kwargs)
            else:
                prev_step = self._pipe_q[-1][1]
                kw_t = {k: v for k, v in kwargs.items() if k != "specs"}
                step = fused.track_frame_step_tables(
                    img_or_pyr, *common,
                    prev_step.next, self._mt_carry,
                    self.pt_seeds, self.ln_seeds,
                    jnp.asarray(self.batch_counter, jnp.int32),
                    self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                    n_levels=self.n_levels, frame_id=fid,
                    mt_delta=jnp.asarray(self.map.pack_mt_deltas(
                        fused.MT_DELTA_DP, fused.MT_DELTA_DL,
                        fused.MT_DELTA_OP, fused.MT_DELTA_OL,
                        fused.MT_DELTA_NE)),
                    **kw_t)
        frame = FrameState.empty(self.cfg, self.frame_id, ts,
                                 list(step.next.pyr),
                                 self.last_frame.R_f_w.copy(),
                                 self.last_frame.t_f_w.copy())
        self._mt_carry = step.mt
        self.pt_seeds = step.pt_seeds
        self.ln_seeds = step.ln_seeds
        self._pipe_q.append((frame, step))
        self.last_frame = frame

        depth = max(1, pl.pipeline_depth)
        if len(self._pipe_q) > depth:
            # stage 1: ONE flat concat for the window + background fetch
            self._initiate_drain(keep=1)
        # stage 2: bookkeep any arrived window (block only under
        # backpressure — two windows already in flight)
        self._complete_drains(force=len(self._fetch_q) > 1)
        return self._ready.pop(0) if self._ready else None

    def _initiate_drain(self, keep: int):
        """Stage 1 of the drain: pop the oldest in-flight frames, pack ALL
        their results into ONE flat vector (each device_get round-trip
        costs ~80 ms over the tunnel regardless of payload — one concat per
        window, NOT one per frame), and hand the blocking fetch to the
        background thread. Bookkeeping happens in _complete_drains when the
        bytes have arrived, ~one window later."""
        n = len(self._pipe_q) - keep
        if n <= 0:
            return
        take = [self._pipe_q.pop(0) for _ in range(n)]
        pending_init = self._pending_seed_init
        self._pending_seed_init = []
        # cap BA entries folded per window: each distinct pending-BA count
        # multiplies the jitted _concat_f32 leaf-signature space (window
        # frame count x init count x BA count) and new variants trigger
        # remote compiles mid-run; overflow entries (rare — >2 keyframes in
        # one window) just ride the NEXT window's fetch
        pending_ba = self._pending_ba[:2]
        self._pending_ba = self._pending_ba[2:]
        with self.permon.timer("sparse_img_align"):
            flat, meta = fused.flatpack((
                [(fused.fetch_view(s.fused), s.pt_conv, s.ln_conv)
                 for _, s in take],
                [h for (_, _, _, h) in pending_init],
                [h for h, _ in pending_ba]))
            fut = fused.submit_fetch(flat)
        self._fetch_q.append(
            ([f for f, _ in take], pending_init, pending_ba, fut, meta))

    def _complete_drains(self, force: bool):
        """Stage 2: bookkeep fetched windows. DETERMINISTIC: a window is
        processed exactly when the next one has been submitted (force) —
        by then its transfer has long overlapped a full window of
        dispatches, so the block is ~free. (An earlier variant also
        processed windows opportunistically when .done(); that made
        bookkeeping order wall-clock-dependent — map updates landed on
        different frames run to run, seed-table widths diverged, and the
        'warm every program variant' bench pass no longer warmed the
        variants the timed pass hit: a ~30 s remote compile landed inside
        the measured window.)"""
        from plsvo_tpu.parallel import ba as ba_mod

        while self._fetch_q and force:
            frames, pending_init, pending_ba, fut, meta = self._fetch_q.pop(0)
            newest_frame = self.last_frame
            with self.permon.timer("reproject"):
                got, init_got, ba_got = fused.flatunpack(fut.result(), meta)
            for (_, bmeta), (kf_R, kf_t, lm_pos) in zip(pending_ba, ba_got):
                ba_mod.write_back_window(self.map, kf_R, kf_t, lm_pos, bmeta)
            for (kf_slot, dm, dmin, _), fetched in zip(pending_init,
                                                       init_got):
                self._complete_seed_init(kf_slot, dm, dmin, *fetched)
            for frame, (res, pt_c, ln_c) in zip(frames, got):
                if self.stage == STAGE_RELOCALIZING:
                    break  # successors of a failed frame are poisoned
                g = tuple(x for x in (pt_c, ln_c) if x is not None)
                self._apply_harvest(g, pt_c is not None, ln_c is not None,
                                    result_frame_id=frame.frame_id)
                self._ready.append(self._post_fused(frame, res))
            if self.stage == STAGE_RELOCALIZING:
                # drop every in-flight successor of the failed frame — but
                # NOT the localBA write-backs / seed inits already folded
                # into queued windows: their device handles are still live
                # and write_back_window / _complete_seed_init guard against
                # stale slots, so re-queue them for the next drain/flush
                # instead of silently losing the refinements
                for _, q_init, q_ba, _, _ in self._fetch_q:
                    self._pending_ba.extend(q_ba)
                    self._pending_seed_init.extend(q_init)
                self._pipe_q.clear()
                self._fetch_q.clear()
                return
            # _post_fused points last_frame at each finalized frame; the
            # newest dispatched frame stays the alignment reference
            self.last_frame = newest_frame
            force = False  # only the first forced completion must block

    def flush(self):
        """Drain all in-flight pipelined frames (call at sequence
        end). Returns the remaining FrameResults in order."""
        if self.cfg.pipeline.pipelined and (self._pipe_q or self._fetch_q):
            self._initiate_drain(keep=0)
            while self._fetch_q:
                self._complete_drains(force=True)
        self._complete_pending_ba()
        out = self._ready
        self._ready = []
        return out

    # (burst execution mode removed in r3: its own A/B measured it
    # LOSING to per-frame pipelined dispatch — commit d4b90a5: 33 vs 40
    # fps device-resident, 22 vs 52 uint8 — while doubling the drain-path
    # surface; VERDICT r2 weak #7)

    def _post_fused(self, frame: FrameState, res) -> FrameResult:
        """Host bookkeeping after the fused core (counters, deletion rules,
        table fills, structure opt, KF policy, depth filter)."""
        pl = self.cfg.pipeline
        last = self.last_frame
        m = self.map

        # --- host bookkeeping (same rules as the staged path) ---
        # lines dropped by the photometric gate lose their landmark link.
        # (Pipelined mode: the device align-input table can carry extra
        # reprojector-retry rows beyond the host frame capacity — slice to
        # the host width.)
        drop = last.seg_valid & ~res.align_seg_alive[:len(last.seg_valid)]
        last.seg_lm[drop] = -1

        pt = res.pt
        lm = pt.lm_idx
        matched = pt.matched
        sel = pt.selected
        m.pt_n_succ[lm[matched]] += 1
        m.pt_n_fail[lm[sel & ~matched]] += 1
        cand_dead = (m.pt_status == ST_CANDIDATE) & (m.pt_n_fail > 30)
        unk_dead = (m.pt_status == ST_UNKNOWN) & (m.pt_n_fail > 15)
        dead = cand_dead | unk_dead
        m.pt_status[dead] = ST_DELETED
        promote = (m.pt_status == ST_UNKNOWN) & (m.pt_n_succ > 10)
        m.pt_status[promote] = ST_GOOD
        if (dead | promote).any():
            m.invalidate("pt_status")
            m.mark_mt_dirty("pt", np.where(dead | promote)[0])
        if dead.any():
            # drop keyframe-table references to deleted landmarks
            # (reference: Map::safeDeletePoint removes frame refs, map.cpp:82-114)
            dead_rows = np.where(dead)[0]
            m.kf_pt_lm[np.isin(m.kf_pt_lm, dead_rows)] = -1

        n_pt_gate = int(matched.sum())
        keep = matched & res.pt_inlier & (m.pt_status[lm] != ST_DELETED)
        rows = np.where(keep)[0][: self.cfg.caps.max_fts]
        n_pt = len(rows)
        frame.pt_uv[:n_pt] = pt.uv[rows]
        frame.pt_f[:n_pt] = self._np_unproject(pt.uv[rows])
        frame.pt_level[:n_pt] = pt.level[rows]
        frame.pt_lm[:n_pt] = lm[rows]
        frame.pt_valid[:] = False
        frame.pt_valid[:n_pt] = True

        n_seg = 0
        n_seg_gate = 0
        if pl.has_ls:
            seg = res.seg
            slm = seg.lm_idx
            smat = seg.matched
            ssel = seg.selected
            n_seg_gate = int(smat.sum())
            m.ln_n_succ[slm[smat]] += 1
            m.ln_n_fail[slm[ssel & ~smat]] += 1
            c_dead = (m.ln_status == ST_CANDIDATE) & (m.ln_n_fail > 30)
            u_dead = (m.ln_status == ST_UNKNOWN) & (m.ln_n_fail > 15)
            ldead = c_dead | u_dead
            m.ln_status[ldead] = ST_DELETED
            lprom = (m.ln_status == ST_UNKNOWN) & (m.ln_n_succ > 10)
            m.ln_status[lprom] = ST_GOOD
            if (ldead | lprom).any():
                m.invalidate("ln_status")
                m.mark_mt_dirty("ln", np.where(ldead | lprom)[0])
            if ldead.any():
                ldead_rows = np.where(ldead)[0]
                m.kf_seg_lm[np.isin(m.kf_seg_lm, ldead_rows)] = -1
            skeep = smat & res.seg_inlier & (m.ln_status[slm] != ST_DELETED)
            srows = np.where(skeep)[0][: self.cfg.caps.max_segs]
            n_seg = len(srows)
            frame.seg_suv[:n_seg] = seg.s_uv[srows]
            frame.seg_euv[:n_seg] = seg.e_uv[srows]
            frame.seg_sf[:n_seg] = self._np_unproject(seg.s_uv[srows])
            frame.seg_ef[:n_seg] = self._np_unproject(seg.e_uv[srows])
            frame.seg_line[:n_seg] = self._np_line_coeffs(
                frame.seg_sf[:n_seg], frame.seg_ef[:n_seg])
            frame.seg_level[:n_seg] = seg.level[srows]
            frame.seg_lm[:n_seg] = slm[srows]
            frame.seg_valid[:] = False
            frame.seg_valid[:n_seg] = True

        # reference gates on POINT+SEGMENT matches combined
        # (frame_handler_mono.cpp:316 repr_n_..._pt + repr_n_..._ls)
        if n_pt_gate + n_seg_gate < pl.quality_min_fts:
            # tracking failed (frame_handler_mono.cpp:315-321)
            frame.R_f_w, frame.t_f_w = last.R_f_w.copy(), last.t_f_w.copy()
            self.stage = STAGE_RELOCALIZING
            return FrameResult(frame.frame_id, STAGE_DEFAULT, QUALITY_INSUFFICIENT,
                               n_pt_gate, n_seg, False, frame.R_f_w, frame.t_f_w)

        # accept the optimized pose (host Gram-Schmidt drift control)
        R = res.R_f_w
        x = R[0] / max(np.linalg.norm(R[0]), 1e-12)
        y = R[1] - np.dot(x, R[1]) * x
        y = y / max(np.linalg.norm(y), 1e-12)
        frame.R_f_w = np.stack([x, y, np.cross(x, y)]).astype(np.float32)
        frame.t_f_w = res.t_f_w.astype(np.float32)
        frame.cov = res.cov

        # --- structure optimization results (computed in the fused core,
        # and ALREADY applied to the device carry in-graph). The mirror
        # rows are ALSO marked dirty: a delta for an unrelated host change
        # (e.g. a promotion) snapshots the whole row from the mirror, and
        # without re-marking, a snapshot taken BEFORE this fetch would
        # leave the carry's position permanently behind the mirror's. The
        # re-send is idempotent (same values) ---
        vsel = res.st_pt_valid
        if vsel.any():
            rows = res.st_pt_lm[vsel]
            m.pt_pos[rows] = res.st_pt_pos[vsel]
            m.pt_last_optim[rows] = frame.frame_id
            m.invalidate("pt_pos")
            m.mark_mt_dirty("pt", rows)
        lsel = res.st_ln_valid
        if lsel.any():
            rows = res.st_ln_lm[lsel]
            m.ln_spos[rows] = res.st_ln_spos[lsel]
            m.ln_epos[rows] = res.st_ln_epos[lsel]
            m.ln_last_optim[rows] = frame.frame_id
            m.invalidate("ln_spos", "ln_epos")
            m.mark_mt_dirty("ln", rows)

        # --- quality + keyframe decision ---
        quality = self._tracking_quality(n_pt, n_seg)
        if quality == QUALITY_INSUFFICIENT:
            # reference: INSUFFICIENT resets pose + fails
            # (frame_handler_mono.cpp:347-351); BAD (big feature drop) only
            # blocks keyframe selection but tracking continues (:354-357)
            frame.R_f_w, frame.t_f_w = last.R_f_w.copy(), last.t_f_w.copy()
            self.stage = STAGE_RELOCALIZING
            return FrameResult(frame.frame_id, STAGE_DEFAULT,
                               QUALITY_INSUFFICIENT,
                               n_pt, n_seg, False, frame.R_f_w, frame.t_f_w)

        d_mean, d_min = self.map.scene_depth(frame)
        need_kf = d_mean is not None and self._need_new_kf(frame) \
            and quality == QUALITY_GOOD
        if need_kf:
            frame.is_keyframe = True
            with self.permon.timer("keyframe_path"):
                self._make_keyframe(frame, d_mean, d_min)
        # (seed updates already ran inside the fused device step, BEFORE the
        # keyframe's new seeds were initialized — the reference's
        # updateSeeds-then-initializeSeeds order, depth_filter.cpp:256-258)

        self.last_frame = frame
        return FrameResult(frame.frame_id, STAGE_DEFAULT, quality, n_pt, n_seg,
                           need_kf, frame.R_f_w, frame.t_f_w)

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    def _tracking_quality(self, n_pt: int, n_seg: int) -> str:
        """frame_handler_base.cpp:173-190: INSUFFICIENT when the COMBINED
        point+segment observation count is below quality_min_fts
        (:176-181 — so segment matches keep line-heavy tracking alive);
        BAD when the POINT drop exceeds quality_max_drop_fts (:183-189;
        the reference ships the segment-drop condition commented out,
        :184). In line-only mode (has_pt=False) the segment-drop check
        takes the points' role via quality_max_drop_fts_segs."""
        pl = self.cfg.pipeline
        if n_pt + n_seg < pl.quality_min_fts:
            return QUALITY_INSUFFICIENT
        if self.results:
            last_pt = self.results[-1].n_pt_matches
            last_seg = self.results[-1].n_seg_matches
        else:
            last_pt, last_seg = n_pt, n_seg
        if pl.has_pt:
            if min(last_pt, pl.max_fts) - n_pt > pl.quality_max_drop_fts:
                return QUALITY_BAD
        elif min(last_seg, pl.max_fts_segs) - n_seg \
                > pl.quality_max_drop_fts_segs:
            return QUALITY_BAD
        return QUALITY_GOOD

    def _need_new_kf(self, frame: FrameState) -> bool:
        """frame_handler_mono.cpp:475-499: no new KF if any keyframe is
        within kfselect_mindist_t AND kfselect_mindist_r."""
        pl = self.cfg.pipeline
        Rf, tf = frame.R_f_w, frame.t_f_w
        occ = np.where(self.map.kf_occupied)[0]
        if len(occ) == 0:
            return True
        # delta = T_frame^-1 * T_kf for all keyframes at once
        tk = self.map.kf_t[occ]
        dt = np.linalg.norm((tk - tf) @ Rf, axis=1)  # |Rf^T (tk - tf)|
        tr = np.einsum("ij,kij->k", Rf, self.map.kf_R[occ])  # trace(Rf^T Rk)
        cosang = np.clip((tr - 1.0) * 0.5, -1.0, 1.0)
        dr = np.degrees(np.arccos(cosang))
        return not bool(np.any((dt < pl.kfselect_mindist_t)
                               & (dr < pl.kfselect_mindist_r)))

    def _make_keyframe(self, frame: FrameState, d_mean, d_min):
        """Keyframe path (frame_handler_mono.cpp:358-402): promote candidate
        landmarks observed here, install KF, spawn new seeds, evict if over
        the KF limit."""
        m = self.map
        # candidates observed in this frame become UNKNOWN
        # (MapPointCandidates promotion, map.cpp:292-309)
        lm = frame.pt_lm[frame.pt_valid & (frame.pt_lm >= 0)]
        cand = lm[m.pt_status[lm] == ST_CANDIDATE]
        m.pt_status[cand] = ST_UNKNOWN
        sl = frame.seg_lm[frame.seg_valid & (frame.seg_lm >= 0)]
        scand = sl[m.ln_status[sl] == ST_CANDIDATE]
        m.ln_status[scand] = ST_UNKNOWN

        # eviction if at capacity (maxNKfs, frame_handler_mono.cpp:394-399)
        max_kfs = self.cfg.pipeline.max_n_kfs or self.cfg.caps.max_kfs
        max_kfs = min(max_kfs, self.cfg.caps.max_kfs)
        if m.n_keyframes() >= max_kfs:
            slot = m.furthest_kf_slot(frame.cam_center_w())
            if slot is not None:
                m.remove_keyframe(slot)
        with self.permon.timer("kf_install"):
            m.add_keyframe(frame)
        self.batch_counter += 1
        with self.permon.timer("kf_init_seeds"):
            defer = (self._defer_seed_init
                     or (self.cfg.pipeline.pipelined
                         and not self._force_sync))
            if defer and d_mean is not None:
                # defer the detection fetch into the next drain window
                # (async seed spawning, like the reference's mapping
                # thread). BatchedVO overrides _queue_or_dispatch_detection
                # to COLLECT requests and run ONE vmapped program per
                # window instead of one per keyframe.
                kf_slot = int(np.where(
                    self.map.kf_frame_id == frame.frame_id)[0][0])
                self._pending_seed_init.append(
                    (kf_slot, d_mean, max(d_min * 0.1, 1e-3),
                     self._queue_or_dispatch_detection(frame)))
            else:
                self._init_seeds(frame, d_mean, max(d_min * 0.1, 1e-3))
        if self.cfg.pipeline.loba_enabled:
            with self.permon.timer("local_ba"):
                self._dispatch_local_ba(frame)

    # -- windowed local bundle adjustment (C16 in the pipeline) ----------
    def _dispatch_local_ba(self, frame: FrameState):
        """Per-keyframe windowed BA (reference intent: ba::localBA at every
        keyframe, frame_handler_mono.cpp:380-383; dead code there, real
        here). Core = FoV-overlapping keyframes of the new KF; everything
        else fixed. The device solve is dispatched here; the (~80 ms
        round-trip) result fetch is deferred into the next drain window in
        pipelined execution and completed inline in sync mode."""
        from plsvo_tpu.parallel import ba as ba_mod

        m = self.map
        kf_slot = int(np.where(m.kf_frame_id == frame.frame_id)[0][0])
        # core = the closest core_n_kfs FoV-overlapping keyframes + the new
        # KF itself (reference: core_kfs = N closest overlapping,
        # frame_handler_mono.cpp:380 / getCloseKeyframes)
        overl = sorted(m.overlap_kfs(frame.R_f_w, frame.t_f_w, self._fx,
                                     self._fy, self._cx, self._cy),
                       key=lambda kd: kd[1])
        core = {k for k, _ in overl[: self.cfg.pipeline.core_n_kfs]}
        core.add(kf_slot)
        if m.n_keyframes() < 3:
            return  # bootstrap window: nothing to adjust yet
        prob, meta = ba_mod.problem_from_window(m, self.cfg, sorted(core))
        if meta["n_points"] + meta["n_lines"] == 0:
            return
        blob, spec = ba_mod.problem_blob(prob)
        # BatchedVO overrides _solve_local_ba to collect same-spec
        # problems across sequences into ONE vmapped solve per window
        handles = self._solve_local_ba(blob, spec)
        defer = (self.cfg.pipeline.pipelined and not self._force_sync) \
            or self._defer_seed_init
        if defer:
            # keep DEVICE handles; the result rides the next drain window's
            # ONE flat fetch. (An earlier variant submitted a separate
            # background fetch per BA: on the single fetch thread it
            # serialized behind the window fetch — which itself blocks a
            # full window period waiting for in-flight steps — and the next
            # drain then ate a blocking 100-250 ms per keyframe waiting for
            # it; measured in scratch/profile_ba_wait.py.)
            self._pending_ba.append((handles, meta))
        else:
            flat, fmeta = fused.flatpack(handles)
            kf_R, kf_t, lm_pos = fused.flatunpack(jax.device_get(flat),
                                                  fmeta)
            ba_mod.write_back_window(m, kf_R, kf_t, lm_pos, meta)

    def _solve_local_ba(self, blob, spec):
        """Dispatch one windowed-BA solve; returns device handles
        (kf_R, kf_t, lm_pos). Overridable (BatchedVO batches these)."""
        from plsvo_tpu.parallel import ba as ba_mod

        out, _stats = ba_mod.bundle_adjust_blob(
            jnp.asarray(blob), spec=spec,
            n_iter=self.cfg.pipeline.loba_num_iter,
            pose_prior=self.cfg.pipeline.loba_pose_prior,
            accept_gate=False)
        return (out.kf_R, out.kf_t, out.lm_pos)

    def _complete_pending_ba(self):
        """Write back in-flight localBA results NOT yet folded into a drain
        window (flush tails, batch-mode boundaries): one flat fetch for all
        of them."""
        from plsvo_tpu.parallel import ba as ba_mod

        if not self._pending_ba:
            return
        pend, self._pending_ba = self._pending_ba, []
        flat, fmeta = fused.flatpack([h for h, _ in pend])
        fetched = fused.flatunpack(jax.device_get(flat), fmeta)
        for (_, meta), (kf_R, kf_t, lm_pos) in zip(pend, fetched):
            ba_mod.write_back_window(self.map, kf_R, kf_t, lm_pos, meta)

    # ------------------------------------------------------------------
    # seed-table access points: BatchedVO overrides these so the tables can
    # live STACKED on device across a whole batch of sequences (per-vo
    # materialization only on keyframes)
    def _get_seed_tables(self):
        return self.pt_seeds, self.ln_seeds

    def _set_seed_tables(self, pt_seeds, ln_seeds):
        self.pt_seeds = pt_seeds
        self.ln_seeds = ln_seeds

    def _queue_or_dispatch_detection(self, frame: FrameState):
        """Deferred-KF detection dispatch point — BatchedVO overrides this
        per instance to batch requests across sequences."""
        return self._dispatch_seed_detection(frame)

    def _dispatch_seed_detection(self, frame: FrameState):
        """Device handles for new-seed detection in a keyframe: FAST grid +
        line segments + cell occupancy of the frame's existing features.
        Dispatch-only; the fetch can be deferred (pipelined mode folds it
        into the next drain fetch — the reference's mapping thread initializes
        seeds asynchronously too, depth_filter.cpp:256-258)."""
        pl = self.cfg.pipeline
        occ_uv, occ_ok = self._occupancy_inputs(frame)
        n_pyr = max(pl.n_pyr_levels, pl.n_pyr_levels_segs)
        grid_dev, segs_dev, occupied, egrid_dev = _kf_detect_program(
            tuple(frame.pyr[:n_pyr]), jnp.asarray(occ_uv),
            jnp.asarray(occ_ok), **self._detect_statics())
        return (grid_dev, segs_dev, occupied, egrid_dev)

    def _occupancy_inputs(self, frame: FrameState):
        """FIXED-capacity occupancy input: a raw len(valid) array changes
        shape every keyframe and forced a fresh XLA compile per KF
        (~0.5 s each over the remote-compile tunnel)."""
        caps = self.cfg.caps
        cap = caps.max_fts + 2 * caps.max_segs
        occ_uv = np.zeros((cap, 2), np.float32)
        occ_ok = np.zeros(cap, bool)
        parts = np.concatenate([
            frame.pt_uv[frame.pt_valid],
            frame.seg_suv[frame.seg_valid], frame.seg_euv[frame.seg_valid]], 0)
        n_occ = min(len(parts), cap)
        occ_uv[:n_occ] = parts[:n_occ]
        occ_ok[:n_occ] = True
        return occ_uv, occ_ok

    def _detect_statics(self) -> dict:
        pl = self.cfg.pipeline
        return dict(
            use_pt=pl.has_pt, use_ls=pl.has_ls,
            use_edgelets=pl.use_edgelets and pl.has_pt,
            n_pyr=pl.n_pyr_levels, n_pyr_segs=pl.n_pyr_levels_segs,
            cell_size=pl.grid_size,
            score_threshold=pl.triang_min_corner_score,
            mag_threshold=pl.edgelet_grad_thresh,
            width=self.cam.width, height=self.cam.height)

    def _init_seeds(self, frame: FrameState, d_mean, d_min):
        """Spawn seeds in grid cells not already holding a feature
        (reference: DepthFilter::initializeSeeds, depth_filter.cpp:151-197)."""
        if d_mean is None:
            return
        kf_slot = int(np.where(self.map.kf_frame_id == frame.frame_id)[0][0])
        with self.permon.timer("kf_detect"):
            flat, meta = fused.flatpack(self._dispatch_seed_detection(frame))
            grid, segs, occupied, egrid = fused.flatunpack(
                jax.device_get(flat), meta)
        self._complete_seed_init(kf_slot, d_mean, d_min, grid, segs,
                                 occupied, egrid)

    def _complete_seed_init(self, kf_slot, d_mean, d_min, grid, segs,
                            occupied, egrid=None):
        """Host half of seed initialization: free-slot assignment + device
        scatter, from fetched detection results. Cells that the FAST grid
        leaves empty spawn EDGELET seeds (dominant-gradient features,
        refined by align1D downstream) when use_edgelets is on."""
        if segs is not None:
            # raw candidate table -> grid dedup on host (see
            # _detect_features)
            segs = self._dedup_segments_host(segs)
        valid = grid.valid & ~occupied
        uv = grid.uv[valid]
        lvl = grid.level[valid]
        typ = np.zeros(len(uv), np.int32)
        gdir = np.zeros((len(uv), 2), np.float32)
        if egrid is not None:
            e_ok = egrid.valid & ~occupied & ~grid.valid
            uv = np.concatenate([uv, egrid.uv[e_ok]], 0)
            lvl = np.concatenate([lvl, egrid.level[e_ok]], 0)
            typ = np.concatenate([typ, np.ones(int(e_ok.sum()), np.int32)])
            gdir = np.concatenate([gdir, egrid.grad_dir[e_ok]], 0)
        f = self._np_unproject(uv) if len(uv) else np.zeros((0, 3), np.float32)

        mu, sigma2, z_range = df.seed_init_params(d_mean, d_min)
        pt_tab, ln_tab = self._get_seed_tables()
        # free slots come from the HOST alive mirror (updated every frame's
        # fetch); new rows scatter into the device tables in one dispatch —
        # no column fetch, no full-table rebuild/upload.
        free = np.where(~self._seed_alive)[0][: len(uv)]
        k = len(free)
        if k:
            sh = self._seed_host
            sh["kf_idx"][free] = kf_slot
            sh["uv"][free] = uv[:k]
            sh["f"][free] = f[:k]
            sh["level"][free] = lvl[:k]
            sh["type"][free] = typ[:k]
            sh["dir"][free] = gdir[:k]
            self._seed_alive[free] = True
            # rows reach the device table now; only steps dispatched from
            # here on (frame_id >= current counter) reflect them
            self._seed_install_frame[free] = self.frame_id
            B = self._bucket(k, self.cfg.caps.max_seeds)
            rows = np.zeros(B, np.float32)
            rows[:k] = free
            mask = np.zeros(B, np.float32)
            mask[:k] = 1.0
            uvp = np.zeros((B, 2), np.float32)
            uvp[:k] = uv[:k]
            fp = np.zeros((B, 3), np.float32)
            fp[:k] = f[:k]
            lv = np.zeros(B, np.float32)
            lv[:k] = lvl[:k]
            # ONE packed upload (layout: scatter_new_point_seeds_blob)
            blob = np.concatenate([
                rows, mask, np.full(B, kf_slot, np.float32),
                uvp.ravel(), fp.ravel(), lv,
                np.asarray([mu, sigma2, z_range,
                            self.batch_counter], np.float32)])
            pt_tab = df.scatter_new_point_seeds_blob(
                pt_tab, jnp.asarray(blob), B=B)

        if segs is not None and self.cfg.pipeline.has_ls:
            sv = segs.valid
            sp = segs.sp[sv]
            ep = segs.ep[sv]
            lfree = np.where(~self._lnseed_alive)[0][: len(sp)]
            k = len(lfree)
            if k:
                sf = self._np_unproject(sp[:k])
                ef = self._np_unproject(ep[:k])
                lh = self._lnseed_host
                lh["kf_idx"][lfree] = kf_slot
                lh["s_uv"][lfree] = sp[:k]
                lh["e_uv"][lfree] = ep[:k]
                lh["sf"][lfree] = sf
                lh["ef"][lfree] = ef
                lh["level"][lfree] = 0
                self._lnseed_alive[lfree] = True
                self._lnseed_install_frame[lfree] = self.frame_id
                B = self._bucket(k, self.cfg.caps.max_seed_segs)
                rows = np.zeros(B, np.float32)
                rows[:k] = lfree
                mask = np.zeros(B, np.float32)
                mask[:k] = 1.0
                z2 = np.zeros((B - k, 2), np.float32)
                z3 = np.zeros((B - k, 3), np.float32)
                blob = np.concatenate([
                    rows, mask, np.full(B, kf_slot, np.float32),
                    np.concatenate([sp[:k], z2]).ravel(),
                    np.concatenate([ep[:k], z2]).ravel(),
                    np.concatenate([sf, z3]).ravel(),
                    np.concatenate([ef, z3]).ravel(),
                    np.zeros(B, np.float32),
                    np.asarray([mu, sigma2, z_range,
                                self.batch_counter], np.float32)])
                ln_tab = df.scatter_new_line_seeds_blob(
                    ln_tab, jnp.asarray(blob), B=B)
                self._any_line_seeds = True
        self._set_seed_tables(pt_tab, ln_tab)

    @staticmethod
    def _bucket(n: int, cap: int) -> int:
        b = 32
        while b < n and b < cap:
            b *= 2
        return min(b, cap)

    def _update_seeds(self, frame: FrameState):
        """Per-frame batched seed update — the mapping-thread analogue.

        Seeds are compacted into the smallest power-of-2 bucket that holds
        the alive rows (host mirror) so the dominant epipolar-search cost
        scales with the LIVE seed count, not the table capacity; the
        view-extract, update, and scatter-back run as ONE dispatch
        (df.update_*_seeds_bucketed). At most log2 bucket sizes compile."""
        pl = self.cfg.pipeline
        m = self.map
        R_w = np.swapaxes(m.kf_R, 1, 2)
        t_w = -np.einsum("kji,kj->ki", m.kf_R, m.kf_t)
        R_w_cur = frame.R_f_w.T
        t_w_cur = -frame.R_f_w.T @ frame.t_f_w
        kw = dict(max_seed_kfs=pl.max_seed_kfs,
                  sigma_conv_factor=pl.seed_convergence_sigma2_thresh)
        pyrs = (m.kf_pyr[: pl.n_pyr_levels], frame.pyr[: pl.n_pyr_levels])
        cam_args = (jnp.asarray(R_w), jnp.asarray(t_w), *pyrs,
                    jnp.asarray(R_w_cur), jnp.asarray(t_w_cur),
                    self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                    jnp.asarray(self.batch_counter, jnp.int32))

        alive_idx = np.where(self._seed_alive)[0]
        if len(alive_idx) == 0:
            self._pt_converged_dev = None
            self._pt_rows = alive_idx
        else:
            B = self._bucket(len(alive_idx), self.cfg.caps.max_seeds)
            rows = np.zeros(B, np.int32)
            rows[: len(alive_idx)] = alive_idx
            pad_alive = np.zeros(B, bool)
            pad_alive[: len(alive_idx)] = True
            self.pt_seeds, res = df.update_point_seeds_bucketed(
                self.pt_seeds, jnp.asarray(rows), jnp.asarray(pad_alive),
                *cam_args, **kw)
            self._pt_converged_dev = (res.converged, res.depth_converged,
                                      res.seeds.alive,
                                      jnp.sum(res.skipped).astype(jnp.int32))
            self._pt_rows = alive_idx

        self._ln_converged_dev = None
        self._ln_rows = np.zeros(0, np.int64)
        if pl.has_ls and self._any_line_seeds:
            lalive_idx = np.where(self._lnseed_alive)[0]
            if len(lalive_idx):
                B = self._bucket(len(lalive_idx), self.cfg.caps.max_seed_segs)
                rows = np.zeros(B, np.int32)
                rows[: len(lalive_idx)] = lalive_idx
                pad_alive = np.zeros(B, bool)
                pad_alive[: len(lalive_idx)] = True
                self.ln_seeds, lres = df.update_line_seeds_bucketed(
                    self.ln_seeds, jnp.asarray(rows), jnp.asarray(pad_alive),
                    *cam_args, **kw)
                self._ln_converged_dev = (lres.converged, lres.depth_s,
                                          lres.depth_e, lres.seeds.alive,
                                          jnp.sum(lres.skipped).astype(
                                              jnp.int32))
                self._ln_rows = lalive_idx

    def _harvest_seeds(self):
        """Fetch + apply any pending seed convergence results (used by the
        rare paths — relocalization; the DEFAULT path folds the fetch into
        the fused-core sync in _process_frame)."""
        pt_pending = self._pt_converged_dev
        ln_pending = self._ln_converged_dev
        fetch = tuple(h for h in (pt_pending, ln_pending) if h is not None)
        if not fetch:
            return
        flat, meta = fused.flatpack(fetch)
        got = fused.flatunpack(jax.device_get(flat), meta)
        self._apply_harvest(got, pt_pending is not None,
                            ln_pending is not None)

    def _apply_harvest(self, got, has_pt: bool, has_ln: bool,
                       result_frame_id: int = None):
        """Converged seeds become CANDIDATE landmarks
        (depth_filter.cpp:333-355 + MapPointCandidates, map.cpp:285-309).
        Convergence masks arrive in bucket space; _pt_rows/_ln_rows map back
        to full-table rows. Host alive-mirrors update from the same fetch."""
        m = self.map
        self._pt_converged_dev = None
        self._ln_converged_dev = None
        gi = 0
        if has_pt:
            g = got[gi]
            gi += 1
            if len(g) == 5:  # COMPACT fused-step format (fused.py)
                rows_c, depth_c, n_conv, alive_w, n_starved = g
                cap = self.cfg.caps.max_seeds
                alive_new = fused.unpack_bits16(alive_w, cap)
                if result_frame_id is not None:
                    # rows installed AFTER this result's step dispatched:
                    # the mask predates them — keep the mirror's truth
                    stale = self._seed_install_frame > result_frame_id
                    alive_new[stale] = self._seed_alive[stale]
                self._seed_alive[:] = alive_new
                pairs = [(int(r), float(d))
                         for r, d in zip(rows_c, depth_c) if r < cap]
                pairs = pairs[: int(n_conv)]
            else:  # staged bucket-mask format (_update_seeds)
                conv, depth, alive_b, *extra = g
                n_starved = int(extra[0]) if extra else 0
                nrows = len(self._pt_rows)
                self._seed_alive[self._pt_rows] = alive_b[:nrows]
                pairs = [(int(self._pt_rows[bi]), float(depth[bi]))
                         for bi in np.where(conv[:nrows])[0]]
            self.permon.log("seed_starved", int(n_starved))
            sh = self._seed_host
            for i, depth_i in pairs:
                k = sh["kf_idx"][i]
                if not m.kf_occupied[k]:
                    continue
                Rk, tk = m.kf_R[k], m.kf_t[k]
                pos_w = Rk.T @ (sh["f"][i] * depth_i - tk)
                m.new_point(pos_w, int(k), sh["uv"][i], sh["f"][i],
                            int(sh["level"][i]), status=ST_CANDIDATE,
                            ftype=int(sh["type"][i]), grad_dir=sh["dir"][i])
        if has_ln:
            g = got[gi]
            if len(g) == 6:  # COMPACT fused-step format
                lrows_c, ds_c, de_c, n_conv, lalive_w, ln_starved = g
                lcap = self.cfg.caps.max_seed_segs
                lalive_new = fused.unpack_bits16(lalive_w, lcap)
                if result_frame_id is not None:
                    lstale = self._lnseed_install_frame > result_frame_id
                    lalive_new[lstale] = self._lnseed_alive[lstale]
                self._lnseed_alive[:] = lalive_new
                lpairs = [(int(r), float(s), float(e))
                          for r, s, e in zip(lrows_c, ds_c, de_c)
                          if r < lcap]
                lpairs = lpairs[: int(n_conv)]
            else:  # staged bucket-mask format
                lconv, ds, de, lalive_b, *lextra = g
                ln_starved = int(lextra[0]) if lextra else 0
                nrows = len(self._ln_rows)
                self._lnseed_alive[self._ln_rows] = lalive_b[:nrows]
                lpairs = [(int(self._ln_rows[bi]), float(ds[bi]),
                           float(de[bi]))
                          for bi in np.where(lconv[:nrows])[0]]
            self.permon.log("seed_starved_ln", int(ln_starved))
            lh = self._lnseed_host
            for i, ds_i, de_i in lpairs:
                k = lh["kf_idx"][i]
                if not m.kf_occupied[k]:
                    continue
                Rk, tk = m.kf_R[k], m.kf_t[k]
                spos = Rk.T @ (lh["sf"][i] * ds_i - tk)
                epos = Rk.T @ (lh["ef"][i] * de_i - tk)
                m.new_line(spos, epos, int(k), lh["s_uv"][i], lh["e_uv"][i],
                           lh["sf"][i], lh["ef"][i], int(lh["level"][i]),
                           status=ST_CANDIDATE)

    # ------------------------------------------------------------------
    def _relocalize(self, pyr, ts) -> FrameResult:
        """frame_handler_mono.cpp:408-436: align against the closest KF."""
        self.n_relocalizations += 1
        frame = FrameState.empty(self.cfg, self.frame_id, ts, pyr,
                                 self.last_frame.R_f_w.copy(),
                                 self.last_frame.t_f_w.copy())
        # closest among FoV-overlapping keyframes (reference:
        # map.cpp:158-199 getCloseKeyframes + getClosestKeyframe) — a
        # near-but-backward-facing KF must NOT win over an overlapping one
        slot = self.map.closest_overlap_kf_slot(
            self.last_frame.R_f_w, self.last_frame.t_f_w,
            self._fx, self._fy, self._cx, self._cy)
        if slot is None:
            self._reset()
            return FrameResult(frame.frame_id, STAGE_RELOCALIZING,
                               QUALITY_INSUFFICIENT, 0, 0, False,
                               frame.R_f_w, frame.t_f_w)
        # build a pseudo frame from the keyframe tables
        kf_frame = self._frame_from_kf(slot, ts)
        pts_in, segs_in = self._align_inputs_from_frame(kf_frame)
        ares = sparse_align.sparse_img_align(
            kf_frame.pyr, pyr, pts_in, segs_in, jnp.eye(3), jnp.zeros(3),
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
            levels=tuple(range(self.cfg.pipeline.klt_max_level,
                               self.cfg.pipeline.klt_min_level - 1, -1)),
            n_iter=self.cfg.pipeline.img_align_n_iter)
        if int(ares.n_tracked_pts) > 30:
            R_ck, t_ck = np.asarray(ares.R), np.asarray(ares.t)
            frame.R_f_w = (R_ck @ kf_frame.R_f_w).astype(np.float32)
            frame.t_f_w = (R_ck @ kf_frame.t_f_w + t_ck).astype(np.float32)
            self.last_frame = kf_frame
            self.stage = STAGE_DEFAULT
            res = self._process_frame(pyr, ts)
            if res is None:
                # pipelined mode: the resumed frame's result surfaces with a
                # later drain fetch (as a DEFAULT-stage result)
                return None
            return FrameResult(res.frame_id, STAGE_RELOCALIZING, res.quality,
                               res.n_pt_matches, res.n_seg_matches,
                               res.is_keyframe, res.R_f_w, res.t_f_w)
        return FrameResult(frame.frame_id, STAGE_RELOCALIZING,
                           QUALITY_INSUFFICIENT, 0, 0, False,
                           frame.R_f_w, frame.t_f_w)

    def _frame_from_kf(self, slot: int, ts) -> FrameState:
        m = self.map
        fr = FrameState.empty(self.cfg, int(m.kf_frame_id[slot]), ts,
                              [p[slot] for p in m.kf_pyr],
                              m.kf_R[slot], m.kf_t[slot])
        fr.pt_uv = m.kf_pt_uv[slot].copy()
        fr.pt_f = m.kf_pt_f[slot].copy()
        fr.pt_level = m.kf_pt_level[slot].copy()
        fr.pt_lm = m.kf_pt_lm[slot].copy()
        fr.pt_valid = m.kf_pt_lm[slot] >= 0
        fr.seg_suv = m.kf_seg_suv[slot].copy()
        fr.seg_euv = m.kf_seg_euv[slot].copy()
        fr.seg_sf = m.kf_seg_sf[slot].copy()
        fr.seg_ef = m.kf_seg_ef[slot].copy()
        fr.seg_level = m.kf_seg_level[slot].copy()
        fr.seg_lm = m.kf_seg_lm[slot].copy()
        fr.seg_valid = m.kf_seg_lm[slot] >= 0
        fr.is_keyframe = True
        return fr

    # -- public control surface (reference: FrameHandlerBase::start/reset,
    # frame_handler_base.h:81-84, lastProcessingTime :93) --
    def reset(self):
        """User-triggered full reset (start over from FIRST)."""
        self._reset()

    def start(self):
        """Resume from PAUSED (the rebuild never auto-pauses; provided for
        API parity)."""
        if self.stage == STAGE_PAUSED:
            self.stage = STAGE_FIRST

    def last_processing_time(self) -> float:
        """Seconds spent in the most recent add_image."""
        return float(self.permon.timers.get("tot_time", 0.0))

    def _reset(self):
        self.stage = STAGE_FIRST
        self.map = MapState(self.cfg, self.n_levels,
                            (self.cam.height, self.cam.width),
                            intrinsics=(self._fx, self._fy,
                                        self._cx, self._cy))
        self.pt_seeds = df.empty_point_seeds(self.cfg.caps.max_seeds)
        self.ln_seeds = df.empty_line_seeds(self.cfg.caps.max_seed_segs)
        self.last_frame = None
        self.first_frame = None
        self.batch_counter = 0
        self._seed_alive[:] = False
        self._lnseed_alive[:] = False
        self._seed_install_frame[:] = -1
        self._lnseed_install_frame[:] = -1
        self._any_line_seeds = False
        self._pipe_q = []
        self._fetch_q = []
        self._ready = []
        self._pending_seed_init = []
        self._pending_ba = []
        self._mt_carry = None
