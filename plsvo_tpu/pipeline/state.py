"""Fixed-capacity SoA state for frames, keyframes, and landmarks.

Replaces the reference's pointer graph — `Frame` with feature lists
(include/plsvo/frame.h:65-66), `Point`/`LineSeg` landmarks with observation
lists and back-references (include/plsvo/feature3D.h:62-73), and the
mutex-guarded `Map`/candidate lists (include/plsvo/map.h) — with flat
tables + masks (SURVEY §7.0). Bookkeeping lives on host in NumPy (small,
control-flow heavy); images/pyramids live on device as JAX arrays.

Landmark status lifecycle (feature3D.h:55-60):
  0 = DELETED, 1 = CANDIDATE, 2 = UNKNOWN, 3 = GOOD
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from plsvo_tpu.config import Config

ST_DELETED = 0


import jax as _jax


@_jax.jit
def _install_kf_pyr(kf_levels, frame_levels, slot):
    """All pyramid levels of one keyframe installed in ONE dispatch (the
    per-level eager .at[].set chain cost ~6 op launches per keyframe)."""
    return tuple(P.at[slot].set(f.astype(P.dtype))
                 for P, f in zip(kf_levels, frame_levels))


@_jax.jit
def _install_kf_pyr_stacked(kf_levels, stacked_levels, k, slot):
    """Same, but slicing sequence k out of a batch-stacked pyramid
    in-graph (LazyPyr case — avoids 6 eager slice ops too)."""
    return tuple(P.at[slot].set(s[k].astype(P.dtype))
                 for P, s in zip(kf_levels, stacked_levels))
ST_CANDIDATE = 1
ST_UNKNOWN = 2
ST_GOOD = 3


@dataclass
class FrameState:
    """One processed frame (host container; pyramid is on device)."""

    frame_id: int
    timestamp: float
    pyr: List[jnp.ndarray]
    R_f_w: np.ndarray  # world -> frame (3,3)
    t_f_w: np.ndarray  # (3,)
    # point features, capacity F
    pt_uv: np.ndarray  # (F,2) level-0 px
    pt_f: np.ndarray  # (F,3) unit bearings
    pt_level: np.ndarray  # (F,)
    pt_lm: np.ndarray  # (F,) landmark row or -1
    pt_valid: np.ndarray  # (F,)
    # segment features, capacity G
    seg_suv: np.ndarray  # (G,2)
    seg_euv: np.ndarray
    seg_sf: np.ndarray  # (G,3)
    seg_ef: np.ndarray
    seg_line: np.ndarray  # (G,3) observed 2D line coeffs
    seg_level: np.ndarray
    seg_lm: np.ndarray
    seg_valid: np.ndarray
    cov: np.ndarray = field(default_factory=lambda: np.eye(6, dtype=np.float32))
    is_keyframe: bool = False

    @classmethod
    def empty(cls, cfg: Config, frame_id: int, timestamp: float,
              pyr: List[jnp.ndarray], R: np.ndarray, t: np.ndarray):
        F = cfg.caps.max_fts
        G = cfg.caps.max_segs
        return cls(
            frame_id=frame_id, timestamp=timestamp, pyr=pyr,
            R_f_w=R.astype(np.float32), t_f_w=t.astype(np.float32),
            pt_uv=np.zeros((F, 2), np.float32), pt_f=np.zeros((F, 3), np.float32),
            pt_level=np.zeros(F, np.int32), pt_lm=np.full(F, -1, np.int32),
            pt_valid=np.zeros(F, bool),
            seg_suv=np.zeros((G, 2), np.float32), seg_euv=np.zeros((G, 2), np.float32),
            seg_sf=np.zeros((G, 3), np.float32), seg_ef=np.zeros((G, 3), np.float32),
            seg_line=np.zeros((G, 3), np.float32), seg_level=np.zeros(G, np.int32),
            seg_lm=np.full(G, -1, np.int32), seg_valid=np.zeros(G, bool),
        )

    def cam_center_w(self) -> np.ndarray:
        """Camera position in world frame: -R^T t."""
        return -self.R_f_w.T @ self.t_f_w

    def n_pt(self) -> int:
        return int((self.pt_valid & (self.pt_lm >= 0)).sum())

    def n_seg(self) -> int:
        return int((self.seg_valid & (self.seg_lm >= 0)).sum())


@dataclass
class MapState:
    """Keyframes + landmark tables (reference: Map, src/map.cpp)."""

    cfg: Config
    n_levels: int
    img_shape: tuple
    # (fx, fy, cx, cy) of the ideal pinhole the VO runs on; used for
    # host-side reprojection during re-anchoring and overlap queries
    intrinsics: tuple = (1.0, 1.0, 0.0, 0.0)

    def __post_init__(self):
        caps = self.cfg.caps
        K = caps.max_kfs
        P = caps.max_points
        L = caps.max_lines
        O = caps.max_obs_per_landmark
        F = caps.max_fts
        G = caps.max_segs
        H, W = self.img_shape
        self.kf_occupied = np.zeros(K, bool)
        self.kf_frame_id = np.full(K, -1, np.int64)
        self.kf_R = np.tile(np.eye(3, dtype=np.float32)[None], (K, 1, 1))  # T_f_w
        self.kf_t = np.zeros((K, 3), np.float32)
        # 5 "key" landmarks per keyframe for FoV-overlap tests: center-most
        # + 4 quadrant extremes among features with landmarks (reference:
        # Frame::setKeyPoints/checkKeyPoints, frame.cpp:87-141)
        self.kf_key_lms = np.full((K, 5), -1, np.int32)
        # device-side pyramid stacks, one array per level
        self.kf_pyr: List[jnp.ndarray] = [
            jnp.zeros((K, H >> l, W >> l), jnp.float32) for l in range(self.n_levels)
        ]
        # per-keyframe feature tables (for sparse-align refs & obs bookkeeping)
        self.kf_pt_uv = np.zeros((K, F, 2), np.float32)
        self.kf_pt_f = np.zeros((K, F, 3), np.float32)
        self.kf_pt_level = np.zeros((K, F), np.int32)
        self.kf_pt_lm = np.full((K, F), -1, np.int32)
        self.kf_seg_suv = np.zeros((K, G, 2), np.float32)
        self.kf_seg_euv = np.zeros((K, G, 2), np.float32)
        self.kf_seg_sf = np.zeros((K, G, 3), np.float32)
        self.kf_seg_ef = np.zeros((K, G, 3), np.float32)
        self.kf_seg_level = np.zeros((K, G), np.int32)
        self.kf_seg_lm = np.full((K, G), -1, np.int32)

        # point landmarks
        self.pt_pos = np.zeros((P, 3), np.float32)
        self.pt_status = np.zeros(P, np.int8)
        self.pt_n_succ = np.zeros(P, np.int32)
        self.pt_n_fail = np.zeros(P, np.int32)
        self.pt_last_optim = np.full(P, -1, np.int64)
        self.pt_anchor_kf = np.full(P, -1, np.int32)
        self.pt_anchor_uv = np.zeros((P, 2), np.float32)
        self.pt_anchor_f = np.zeros((P, 3), np.float32)
        self.pt_anchor_level = np.zeros(P, np.int32)
        # feature class of the anchor observation (reference feature.h:54-73:
        # CORNER=0 / EDGELET=1) + the edgelet's dominant gradient direction
        # in anchor-level pixel units; the matcher routes EDGELET refinement
        # through align1D along the warped direction (matcher.cpp:191-207)
        self.pt_anchor_type = np.zeros(P, np.int32)
        self.pt_anchor_dir = np.zeros((P, 2), np.float32)
        self.pt_obs_kf = np.full((P, O), -1, np.int32)
        self.pt_obs_f = np.zeros((P, O, 3), np.float32)
        self.pt_obs_uv = np.zeros((P, O, 2), np.float32)
        self.pt_obs_level = np.zeros((P, O), np.int32)
        self.pt_obs_ptr = np.zeros(P, np.int32)
        # write stamp per slot (value of pt_obs_ptr at write): recency is
        # derived from stamps, NOT slot order — slot order breaks once the
        # table wraps or freed slots are reused (VERDICT r2 missing #2)
        self.pt_obs_stamp = np.full((P, O), -1, np.int64)

        # line-segment landmarks (endpoints)
        self.ln_spos = np.zeros((L, 3), np.float32)
        self.ln_epos = np.zeros((L, 3), np.float32)
        self.ln_status = np.zeros(L, np.int8)
        self.ln_n_succ = np.zeros(L, np.int32)
        self.ln_n_fail = np.zeros(L, np.int32)
        self.ln_last_optim = np.full(L, -1, np.int64)
        self.ln_anchor_kf = np.full(L, -1, np.int32)
        self.ln_anchor_suv = np.zeros((L, 2), np.float32)
        self.ln_anchor_euv = np.zeros((L, 2), np.float32)
        self.ln_anchor_sf = np.zeros((L, 3), np.float32)
        self.ln_anchor_ef = np.zeros((L, 3), np.float32)
        self.ln_anchor_level = np.zeros(L, np.int32)
        self.ln_obs_kf = np.full((L, O), -1, np.int32)
        self.ln_obs_sf = np.zeros((L, O, 3), np.float32)
        self.ln_obs_ef = np.zeros((L, O, 3), np.float32)
        self.ln_obs_ptr = np.zeros(L, np.int32)
        self.ln_obs_stamp = np.full((L, O), -1, np.int64)

        # device-side cache of host tables; invalidated explicitly by the
        # mutators so per-frame stages skip re-uploading unchanged tables
        self._dev: dict = {}
        # CARRY-mode delta queues (fused.apply_mt_deltas): when MapTables
        # live on device as a step-to-step carry, host-initiated mutations
        # enqueue row ids here and ship as ONE packed blob per frame
        # (pack_mt_deltas). dicts double as ordered sets (FIFO spill).
        self._mt_dirty = {"pt": {}, "ln": {}}
        self._mt_obs_delta = {"pt": {}, "ln": {}}  # (row, slot) pairs
        self._mt_obs_reset = {"pt": set(), "ln": set()}  # full-row clears
        self._mt_evicted: list = []
        self._mt_overflow = False  # map-wide change (transform): resync
        # observation tables sync by ROW DELTAS instead of invalidation:
        # full (P, O, .) obs uploads are ~2.3 MB per keyframe per sequence
        # and dominated the keyframe-frame host time (measured multi-second
        # stalls at batched drain windows); per-KF only a few hundred rows
        # change, so mutators record dirty rows and dev_obs() scatters just
        # those into the persistent device copies
        self._dev_obs: dict = {}
        self._obs_dirty = {"pt": set(), "ln": set()}

    _OBS_GROUPS = {
        "pt": ("pt_obs_kf", "pt_obs_uv", "pt_obs_f", "pt_obs_level"),
        "ln": ("ln_obs_kf", "ln_obs_sf", "ln_obs_ef"),
    }

    def dev(self, name: str):
        """Device copy of a host table, cached until invalidated."""
        if name not in self._dev:
            self._dev[name] = jnp.asarray(getattr(self, name))
        return self._dev[name]

    def _sync_obs(self, group: str):
        names = self._OBS_GROUPS[group]
        if names[0] not in self._dev_obs:
            for n in names:
                self._dev_obs[n] = jnp.asarray(getattr(self, n))
            self._obs_dirty[group].clear()
            return
        dirty = self._obs_dirty[group]
        if dirty:
            rows = np.fromiter(dirty, np.int32, len(dirty))
            r = jnp.asarray(rows)
            for n in names:
                self._dev_obs[n] = self._dev_obs[n].at[r].set(
                    jnp.asarray(getattr(self, n)[rows]))
            dirty.clear()

    def dev_obs(self, name: str):
        """Device copy of an observation table, synced by row deltas."""
        group = "pt" if name.startswith("pt") else "ln"
        self._sync_obs(group)
        return self._dev_obs[name]

    def _obs_clear_kf_on_device(self, slot: int):
        """Mirror remove_keyframe's `obs_kf == slot -> -1` onto the device
        copies WITHOUT any upload (values for dead slots are stale but the
        device only reads slots with kf >= 0)."""
        for group, kf_name in (("pt", "pt_obs_kf"), ("ln", "ln_obs_kf")):
            if kf_name in self._dev_obs:
                a = self._dev_obs[kf_name]
                self._dev_obs[kf_name] = jnp.where(a == slot, -1, a)

    # ---- carry-mode delta packing (fused.apply_mt_deltas layout) --------
    def mark_mt_dirty(self, kind: str, rows):
        """Queue landmark rows ('pt'/'ln') for full-row sync to the device
        carry (status/pos/anchor changes decided on host)."""
        d = self._mt_dirty[kind]
        for r in np.atleast_1d(np.asarray(rows, np.int64)):
            d[int(r)] = None

    def mt_mark_clean(self):
        """Drop every queued delta — call when the carry is (re)built from
        a full upload of the host mirror, which already contains them."""
        for d in self._mt_dirty.values():
            d.clear()
        for d in self._mt_obs_delta.values():
            d.clear()
        for s in self._mt_obs_reset.values():
            s.clear()
        self._mt_evicted = []
        self._mt_overflow = False

    def mt_dirty_pending(self) -> int:
        return (sum(len(d) for d in self._mt_dirty.values())
                + sum(len(d) for d in self._mt_obs_delta.values())
                + len(self._mt_evicted))

    def pack_mt_deltas(self, DP: int, DL: int, OP: int, OL: int,
                       NE: int) -> np.ndarray:
        """Drain up to the given widths from the delta queues into ONE flat
        f32 blob (layout documented at fused.apply_mt_deltas). Overflow
        stays queued for the next frame's blob — deltas are idempotent
        full-row snapshots read from the mirror AT PACK TIME, so spilling
        only delays sync, never corrupts it."""
        K = self.cfg.caps.max_kfs

        def drain(d, n, skip=None):
            # skip: obs pairs whose row still has an UNSHIPPED obs-reset
            # must wait for the row delta (resets apply before appends
            # in-graph; shipping the append first would let a later reset
            # wipe it)
            if isinstance(d, list):
                keys = d[:n]
                del d[:len(keys)]
                return keys
            keys = []
            for k in d:
                if len(keys) >= n:
                    break
                if skip is not None and k[0] in skip:
                    continue
                keys.append(k)
            for k in keys:
                del d[k]
            return keys

        assert len(self._mt_evicted) <= NE, "eviction list must not spill"
        ev = np.full(NE, -1, np.float32)
        got = drain(self._mt_evicted, NE)
        ev[:len(got)] = got

        parts = [ev, self.kf_R.ravel().astype(np.float32),
                 self.kf_t.ravel().astype(np.float32)]

        # point rows
        rows = np.asarray(drain(self._mt_dirty["pt"], DP), np.int64)
        n = len(rows)
        idx = np.zeros(DP, np.float32)
        idx[:n] = rows
        mask = np.zeros(DP, np.float32)
        mask[:n] = 1.0
        reset = np.zeros(DP, np.float32)
        if n:
            rs = self._mt_obs_reset["pt"]
            reset[:n] = [1.0 if int(r) in rs else 0.0 for r in rows]
            rs.difference_update(int(r) for r in rows)
        r0 = rows if n else np.zeros(0, np.int64)

        def rowsel(tab, width, cols):
            out = np.zeros((width,) + tab.shape[1:], np.float32)
            if n:
                out[:n] = tab[r0]
            return out.ravel()

        parts += [idx, mask, reset,
                  rowsel(self.pt_pos, DP, 3),
                  rowsel(self.pt_status.astype(np.float32), DP, 1),
                  rowsel(self.pt_anchor_kf.astype(np.float32), DP, 1),
                  rowsel(self.pt_anchor_uv, DP, 2),
                  rowsel(self.pt_anchor_f, DP, 3),
                  rowsel(self.pt_anchor_level.astype(np.float32), DP, 1),
                  rowsel(self.pt_anchor_type.astype(np.float32), DP, 1),
                  rowsel(self.pt_anchor_dir, DP, 2)]

        # line rows
        rows = np.asarray(drain(self._mt_dirty["ln"], DL), np.int64)
        n = len(rows)
        idx = np.zeros(DL, np.float32)
        idx[:n] = rows
        mask = np.zeros(DL, np.float32)
        mask[:n] = 1.0
        reset = np.zeros(DL, np.float32)
        if n:
            rs = self._mt_obs_reset["ln"]
            reset[:n] = [1.0 if int(r) in rs else 0.0 for r in rows]
            rs.difference_update(int(r) for r in rows)
        r0 = rows if n else np.zeros(0, np.int64)
        parts += [idx, mask, reset,
                  rowsel(self.ln_spos, DL, 3),
                  rowsel(self.ln_epos, DL, 3),
                  rowsel(self.ln_status.astype(np.float32), DL, 1),
                  rowsel(self.ln_anchor_kf.astype(np.float32), DL, 1),
                  rowsel(self.ln_anchor_suv, DL, 2),
                  rowsel(self.ln_anchor_euv, DL, 2),
                  rowsel(self.ln_anchor_sf, DL, 3),
                  rowsel(self.ln_anchor_ef, DL, 3),
                  rowsel(self.ln_anchor_level.astype(np.float32), DL, 1)]

        # point obs deltas
        pairs = drain(self._mt_obs_delta["pt"], OP,
                      skip=self._mt_obs_reset["pt"])
        n = len(pairs)
        orow = np.zeros(OP, np.float32)
        oslot = np.zeros(OP, np.float32)
        omask = np.zeros(OP, np.float32)
        okf = np.zeros(OP, np.float32)
        ouv = np.zeros((OP, 2), np.float32)
        of = np.zeros((OP, 3), np.float32)
        olvl = np.zeros(OP, np.float32)
        for i, (r, s) in enumerate(pairs):
            orow[i], oslot[i], omask[i] = r, s, 1.0
            okf[i] = self.pt_obs_kf[r, s]
            ouv[i] = self.pt_obs_uv[r, s]
            of[i] = self.pt_obs_f[r, s]
            olvl[i] = self.pt_obs_level[r, s]
        parts += [orow, oslot, omask, okf, ouv.ravel(), of.ravel(), olvl]

        # line obs deltas
        pairs = drain(self._mt_obs_delta["ln"], OL,
                      skip=self._mt_obs_reset["ln"])
        orow = np.zeros(OL, np.float32)
        oslot = np.zeros(OL, np.float32)
        omask = np.zeros(OL, np.float32)
        okf = np.zeros(OL, np.float32)
        osf = np.zeros((OL, 3), np.float32)
        oef = np.zeros((OL, 3), np.float32)
        for i, (r, s) in enumerate(pairs):
            orow[i], oslot[i], omask[i] = r, s, 1.0
            okf[i] = self.ln_obs_kf[r, s]
            osf[i] = self.ln_obs_sf[r, s]
            oef[i] = self.ln_obs_ef[r, s]
        parts += [orow, oslot, omask, okf, osf.ravel(), oef.ravel()]
        return np.concatenate(parts)

    def kf_atlas_flat(self, n_levels: int):
        """Flat-packed keyframe pyramid super-atlas (image.FlatAtlas),
        cached until the next keyframe install/removal — packing costs
        hundreds of MB of HBM traffic, so doing it once per keyframe change
        instead of inside every fused frame step saves ~1-2 ms/frame."""
        key = f"_kf_atlas_flat_{n_levels}"
        if key not in self._dev:
            from plsvo_tpu.image import pack_pyramid_atlas_flat

            self._dev[key] = pack_pyramid_atlas_flat(self.kf_pyr[:n_levels])
        return self._dev[key]

    def invalidate(self, *names: str):
        if not names:
            self._dev.clear()
        for n in names:
            self._dev.pop(n, None)

    # ---- keyframe management -------------------------------------------
    def n_keyframes(self) -> int:
        return int(self.kf_occupied.sum())

    def free_kf_slot(self) -> Optional[int]:
        free = np.where(~self.kf_occupied)[0]
        return int(free[0]) if len(free) else None

    def furthest_kf_slot(self, pos_w: np.ndarray) -> Optional[int]:
        """Slot of the keyframe furthest from pos_w (map.cpp:195-214)."""
        occ = np.where(self.kf_occupied)[0]
        if len(occ) == 0:
            return None
        centers = np.stack([
            -self.kf_R[k].T @ self.kf_t[k] for k in occ])
        d = np.linalg.norm(centers - pos_w[None], axis=-1)
        return int(occ[np.argmax(d)])

    def closest_kf_slot(self, pos_w: np.ndarray) -> Optional[int]:
        occ = np.where(self.kf_occupied)[0]
        if len(occ) == 0:
            return None
        centers = np.stack([
            -self.kf_R[k].T @ self.kf_t[k] for k in occ])
        d = np.linalg.norm(centers - pos_w[None], axis=-1)
        return int(occ[np.argmin(d)])

    # ---- FoV-overlap queries (reference: Map::getCloseKeyframes,
    # map.cpp:158-179 + Frame::isVisible, frame.cpp:156-166) ----
    def _set_key_landmarks(self, slot: int, frame: "FrameState"):
        """Pick the 5 key landmarks of a new keyframe: center-most + the 4
        quadrant extremes by |du*dv| (frame.cpp:87-141)."""
        W2 = self.img_shape[1] / 2.0
        H2 = self.img_shape[0] / 2.0
        self.kf_key_lms[slot] = -1
        sel = frame.pt_valid & (frame.pt_lm >= 0)
        if not sel.any():
            return
        uv = frame.pt_uv[sel]
        lm = frame.pt_lm[sel]
        du = uv[:, 0] - W2
        dv = uv[:, 1] - H2
        self.kf_key_lms[slot, 0] = lm[np.argmin(np.maximum(
            np.abs(du), np.abs(dv)))]
        quads = [(du >= 0) & (dv >= 0), (du >= 0) & (dv < 0),
                 (du < 0) & (dv < 0), (du < 0) & (dv >= 0)]
        for q, m in enumerate(quads):
            if m.any():
                idx = np.where(m)[0]
                self.kf_key_lms[slot, 1 + q] = lm[
                    idx[np.argmax(du[idx] * dv[idx])]]

    def overlap_kfs(self, R_f_w: np.ndarray, t_f_w: np.ndarray,
                    fx: float, fy: float, cx: float, cy: float):
        """Keyframes sharing field of view with the query pose: a KF
        overlaps when any of its (live) key landmarks projects inside the
        query frame with positive depth. Returns [(slot, distance)]."""
        H, W = self.img_shape
        pos_q = -R_f_w.T @ t_f_w
        out = []
        for k in np.where(self.kf_occupied)[0]:
            lms = self.kf_key_lms[k]
            lms = lms[(lms >= 0)]
            lms = lms[self.pt_status[lms] > 0] if len(lms) else lms
            if len(lms) == 0:
                continue
            xyz = self.pt_pos[lms] @ R_f_w.T + t_f_w
            z = xyz[:, 2]
            front = z > 0
            zs = np.where(front, z, 1.0)
            u = fx * xyz[:, 0] / zs + cx
            v = fy * xyz[:, 1] / zs + cy
            vis = front & (u >= 0) & (v >= 0) & (u < W) & (v < H)
            if vis.any():
                center_k = -self.kf_R[k].T @ self.kf_t[k]
                out.append((int(k), float(np.linalg.norm(center_k - pos_q))))
        return out

    def closest_overlap_kf_slot(self, R_f_w, t_f_w, fx, fy, cx, cy,
                                exclude_frame_id: int = -1) -> Optional[int]:
        """Closest keyframe among those with FoV overlap (reference:
        Map::getClosestKeyframe, map.cpp:181-199); falls back to pure
        distance when nothing overlaps (total occlusion/blackout)."""
        cands = self.overlap_kfs(R_f_w, t_f_w, fx, fy, cx, cy)
        cands = [(k, d) for (k, d) in cands
                 if self.kf_frame_id[k] != exclude_frame_id]
        if not cands:
            return self.closest_kf_slot(-R_f_w.T @ t_f_w)
        return min(cands, key=lambda kd: kd[1])[0]

    def add_keyframe(self, frame: FrameState) -> int:
        """Install a frame into a keyframe slot (evict handled by caller)."""
        slot = self.free_kf_slot()
        assert slot is not None, "no free keyframe slot — evict first"
        self.kf_occupied[slot] = True
        self.kf_frame_id[slot] = frame.frame_id
        self.kf_R[slot] = frame.R_f_w
        self.kf_t[slot] = frame.t_f_w
        self.invalidate()  # keyframe install touches poses/anchors/obs
        from plsvo_tpu.image import LazyPyr

        slot_t = jnp.asarray(slot, jnp.int32)
        if isinstance(frame.pyr, LazyPyr):
            self.kf_pyr = list(_install_kf_pyr_stacked(
                tuple(self.kf_pyr),
                tuple(frame.pyr._s[: self.n_levels]),
                jnp.asarray(frame.pyr._k, jnp.int32), slot_t))
        else:
            self.kf_pyr = list(_install_kf_pyr(
                tuple(self.kf_pyr), tuple(frame.pyr[: self.n_levels]),
                slot_t))
        self.kf_pt_uv[slot] = frame.pt_uv
        self.kf_pt_f[slot] = frame.pt_f
        self.kf_pt_level[slot] = frame.pt_level
        self.kf_pt_lm[slot] = np.where(frame.pt_valid, frame.pt_lm, -1)
        self.kf_seg_suv[slot] = frame.seg_suv
        self.kf_seg_euv[slot] = frame.seg_euv
        self.kf_seg_sf[slot] = frame.seg_sf
        self.kf_seg_ef[slot] = frame.seg_ef
        self.kf_seg_level[slot] = frame.seg_level
        self.kf_seg_lm[slot] = np.where(frame.seg_valid, frame.seg_lm, -1)

        # register observations + refresh anchors to this (newest) keyframe
        # — VECTORIZED: the per-feature Python loop (~190 _add_pt_obs
        # calls) cost ~9 ms per keyframe install and serialized B
        # sequences' keyframes inside the batched drain windows
        sel = np.where(frame.pt_valid & (frame.pt_lm >= 0))[0]
        if len(sel):
            # first frame-row per landmark wins (duplicates are not
            # expected from the reprojector, but stay safe)
            lm, first = np.unique(frame.pt_lm[sel], return_index=True)
            sel = sel[first]
            slots = self._obs_slots_vec(self.pt_obs_kf[lm],
                                        self.pt_obs_stamp[lm])
            self.pt_obs_kf[lm, slots] = slot
            self.pt_obs_f[lm, slots] = frame.pt_f[sel]
            self.pt_obs_uv[lm, slots] = frame.pt_uv[sel]
            self.pt_obs_level[lm, slots] = frame.pt_level[sel]
            self.pt_obs_stamp[lm, slots] = self.pt_obs_ptr[lm]
            self.pt_obs_ptr[lm] += 1
            self.pt_anchor_kf[lm] = slot
            self.pt_anchor_uv[lm] = frame.pt_uv[sel]
            self.pt_anchor_f[lm] = frame.pt_f[sel]
            self.pt_anchor_level[lm] = frame.pt_level[sel]
            d_pt = self._mt_dirty["pt"]
            od_pt = self._mt_obs_delta["pt"]
            dirty = self._obs_dirty["pt"]
            for r, s in zip(lm.tolist(), slots.tolist()):
                d_pt[r] = None
                od_pt[(r, s)] = None
                dirty.add(r)
        sel = np.where(frame.seg_valid & (frame.seg_lm >= 0))[0]
        if len(sel):
            lm, first = np.unique(frame.seg_lm[sel], return_index=True)
            sel = sel[first]
            slots = self._obs_slots_vec(self.ln_obs_kf[lm],
                                        self.ln_obs_stamp[lm])
            self.ln_obs_kf[lm, slots] = slot
            self.ln_obs_sf[lm, slots] = frame.seg_sf[sel]
            self.ln_obs_ef[lm, slots] = frame.seg_ef[sel]
            self.ln_obs_stamp[lm, slots] = self.ln_obs_ptr[lm]
            self.ln_obs_ptr[lm] += 1
            self.ln_anchor_kf[lm] = slot
            self.ln_anchor_suv[lm] = frame.seg_suv[sel]
            self.ln_anchor_euv[lm] = frame.seg_euv[sel]
            self.ln_anchor_sf[lm] = frame.seg_sf[sel]
            self.ln_anchor_ef[lm] = frame.seg_ef[sel]
            self.ln_anchor_level[lm] = frame.seg_level[sel]
            d_ln = self._mt_dirty["ln"]
            od_ln = self._mt_obs_delta["ln"]
            dirty = self._obs_dirty["ln"]
            for r, s in zip(lm.tolist(), slots.tolist()):
                d_ln[r] = None
                od_ln[(r, s)] = None
                dirty.add(r)
        self._set_key_landmarks(slot, frame)
        return slot

    @staticmethod
    def _obs_slots_vec(obs_kf_rows: np.ndarray,
                       stamp_rows: np.ndarray) -> np.ndarray:
        """Vectorized _obs_slot over N landmark rows: first FREE slot per
        row, else the oldest live observation (min write stamp)."""
        free = obs_kf_rows < 0
        has_free = free.any(axis=1)
        first_free = np.argmax(free, axis=1)
        oldest = np.argmin(stamp_rows, axis=1)
        return np.where(has_free, first_free, oldest)

    def remove_keyframe(self, slot: int):
        """Evict a keyframe with reference-counting landmark deletion
        (reference: Map::removePtFrameRef/removeLsFrameRef, map.cpp:82-114
        — a landmark observed ≤2 times dies when one ref is removed).
        Landmarks with ≥3 observations survive; if the evicted keyframe was
        their warp ANCHOR they are re-anchored to another live observation
        (the reference keeps all obs and picks per query via
        getCloseViewObs; our tables cache one anchor, so re-pick here)."""
        self.kf_occupied[slot] = False
        self.kf_frame_id[slot] = -1
        self.kf_pt_lm[slot] = -1
        self.kf_seg_lm[slot] = -1
        self.kf_key_lms[slot] = -1
        self.invalidate()
        self._obs_clear_kf_on_device(slot)
        # carry path: one in-graph `obs_kf == slot -> -1` sweep; queued
        # pairs referencing the dead slot would re-apply stale kf values,
        # so drop them (the mirror already holds -1 there)
        self._mt_evicted.append(int(slot))
        for kind, kf_tab in (("pt", self.pt_obs_kf), ("ln", self.ln_obs_kf)):
            dd = self._mt_obs_delta[kind]
            for key in [k for k in dd if kf_tab[k[0], k[1]] == slot]:
                del dd[key]

        # --- points ---
        observed_here = (self.pt_obs_kf == slot).any(axis=1)
        n_obs = (self.pt_obs_kf >= 0).sum(axis=1)
        live = self.pt_status > 0
        dead = live & observed_here & (n_obs <= 2)
        self.pt_status[dead] = ST_DELETED
        self.pt_obs_stamp[self.pt_obs_kf == slot] = -1
        self.pt_obs_kf[self.pt_obs_kf == slot] = -1
        # survivors anchored at the evicted KF: re-anchor to any live obs
        need = live & ~dead & (self.pt_anchor_kf == slot)
        for r in np.where(need)[0]:
            oks = np.where((self.pt_obs_kf[r] >= 0)
                           & self.kf_occupied[
                               np.maximum(self.pt_obs_kf[r], 0)])[0]
            if len(oks) == 0:
                self.pt_status[r] = ST_DELETED
                dead[r] = True  # scrub kf-table refs below too
                continue
            o = oks[np.argmax(self.pt_obs_stamp[r, oks])]  # most recent
            self.pt_anchor_kf[r] = self.pt_obs_kf[r, o]
            self.pt_anchor_uv[r] = self.pt_obs_uv[r, o]
            self.pt_anchor_f[r] = self.pt_obs_f[r, o]
            self.pt_anchor_level[r] = self.pt_obs_level[r, o]

        # --- lines (obs store bearings only; uv re-projected on demand) ---
        lobserved = (self.ln_obs_kf == slot).any(axis=1)
        ln_obs = (self.ln_obs_kf >= 0).sum(axis=1)
        llive = self.ln_status > 0
        ldead = llive & lobserved & (ln_obs <= 2)
        self.ln_status[ldead] = ST_DELETED
        self.ln_obs_stamp[self.ln_obs_kf == slot] = -1
        self.ln_obs_kf[self.ln_obs_kf == slot] = -1
        lneed = llive & ~ldead & (self.ln_anchor_kf == slot)
        for r in np.where(lneed)[0]:
            oks = np.where((self.ln_obs_kf[r] >= 0)
                           & self.kf_occupied[
                               np.maximum(self.ln_obs_kf[r], 0)])[0]
            if len(oks) == 0:
                self.ln_status[r] = ST_DELETED
                ldead[r] = True  # scrub kf-table refs below too
                continue
            o = oks[np.argmax(self.ln_obs_stamp[r, oks])]
            k = self.ln_obs_kf[r, o]
            self.ln_anchor_kf[r] = k
            self.ln_anchor_sf[r] = self.ln_obs_sf[r, o]
            self.ln_anchor_ef[r] = self.ln_obs_ef[r, o]
            # project endpoints into the new anchor for the cached uvs
            fx, fy, cx, cy = self.intrinsics
            for pos, tgt in ((self.ln_spos[r], self.ln_anchor_suv),
                             (self.ln_epos[r], self.ln_anchor_euv)):
                xyz = self.kf_R[k] @ pos + self.kf_t[k]
                z = max(float(xyz[2]), 1e-6)
                tgt[r] = (fx * xyz[0] / z + cx, fy * xyz[1] / z + cy)
        # remove dead landmarks from every keyframe feature table
        if dead.any():
            self.kf_pt_lm[np.isin(self.kf_pt_lm, np.where(dead)[0])] = -1
        if ldead.any():
            self.kf_seg_lm[np.isin(self.kf_seg_lm, np.where(ldead)[0])] = -1

    # ---- landmark management -------------------------------------------
    @staticmethod
    def _obs_slot(obs_kf_row, stamp_row):
        """Slot to write: a FREE slot first (evictions free slots by
        setting kf=-1), else evict the OLDEST live observation (min write
        stamp). With max_obs_per_landmark >= the keyframe-ring size this
        only ever recycles freed slots, so no live constraint is lost —
        matching the reference's unbounded obs list whose entries die with
        their frames (feature3D.h:62-73, map.cpp:82-114)."""
        free = np.where(obs_kf_row < 0)[0]
        if len(free):
            return int(free[0])
        return int(np.argmin(stamp_row))

    def _add_pt_obs(self, lm: int, kf_slot: int, f: np.ndarray,
                    uv: np.ndarray = None, level: int = 0):
        p = self._obs_slot(self.pt_obs_kf[lm], self.pt_obs_stamp[lm])
        self.pt_obs_kf[lm, p] = kf_slot
        self.pt_obs_f[lm, p] = f
        if uv is not None:
            self.pt_obs_uv[lm, p] = uv
        self.pt_obs_level[lm, p] = level
        self.pt_obs_stamp[lm, p] = self.pt_obs_ptr[lm]
        self.pt_obs_ptr[lm] += 1
        self._obs_dirty["pt"].add(int(lm))
        self._mt_obs_delta["pt"][(int(lm), int(p))] = None

    def _add_ln_obs(self, lm: int, kf_slot: int, sf: np.ndarray, ef: np.ndarray):
        p = self._obs_slot(self.ln_obs_kf[lm], self.ln_obs_stamp[lm])
        self.ln_obs_kf[lm, p] = kf_slot
        self.ln_obs_sf[lm, p] = sf
        self.ln_obs_ef[lm, p] = ef
        self.ln_obs_stamp[lm, p] = self.ln_obs_ptr[lm]
        self.ln_obs_ptr[lm] += 1
        self._obs_dirty["ln"].add(int(lm))
        self._mt_obs_delta["ln"][(int(lm), int(p))] = None

    def alloc_points(self, n: int) -> np.ndarray:
        """Return up to n free point rows (status DELETED)."""
        free = np.where(self.pt_status == ST_DELETED)[0]
        return free[:n]

    def alloc_lines(self, n: int) -> np.ndarray:
        free = np.where(self.ln_status == ST_DELETED)[0]
        return free[:n]

    def new_point(self, pos_w, kf_slot, uv, f, level, status=ST_UNKNOWN,
                  ftype: int = 0, grad_dir=None) -> int:
        rows = self.alloc_points(1)
        if len(rows) == 0:
            return -1
        r = int(rows[0])
        self.pt_pos[r] = pos_w
        self.pt_status[r] = status
        self.pt_n_succ[r] = 0
        self.pt_n_fail[r] = 0
        self.pt_last_optim[r] = -1
        self.pt_anchor_kf[r] = kf_slot
        self.pt_anchor_uv[r] = uv
        self.pt_anchor_f[r] = f
        self.pt_anchor_level[r] = level
        self.pt_anchor_type[r] = ftype
        self.pt_anchor_dir[r] = (0.0, 0.0) if grad_dir is None else grad_dir
        self.pt_obs_kf[r] = -1
        self.pt_obs_stamp[r] = -1
        self.pt_obs_ptr[r] = 0
        self._obs_dirty["pt"].add(int(r))
        self._mt_dirty["pt"][int(r)] = None
        self._mt_obs_reset["pt"].add(int(r))
        self._add_pt_obs(r, kf_slot, f, uv, level)
        self.invalidate("pt_pos", "pt_status", "pt_anchor_kf", "pt_anchor_uv",
                        "pt_anchor_f", "pt_anchor_level", "pt_anchor_type",
                        "pt_anchor_dir", "pt_obs_kf",
                        "pt_obs_uv", "pt_obs_f", "pt_obs_level")
        return r

    def new_line(self, spos_w, epos_w, kf_slot, suv, euv, sf, ef, level,
                 status=ST_UNKNOWN) -> int:
        rows = self.alloc_lines(1)
        if len(rows) == 0:
            return -1
        r = int(rows[0])
        self.ln_spos[r] = spos_w
        self.ln_epos[r] = epos_w
        self.ln_status[r] = status
        self.ln_n_succ[r] = 0
        self.ln_n_fail[r] = 0
        self.ln_last_optim[r] = -1
        self.ln_anchor_kf[r] = kf_slot
        self.ln_anchor_suv[r] = suv
        self.ln_anchor_euv[r] = euv
        self.ln_anchor_sf[r] = sf
        self.ln_anchor_ef[r] = ef
        self.ln_anchor_level[r] = level
        self.ln_obs_kf[r] = -1
        self.ln_obs_stamp[r] = -1
        self.ln_obs_ptr[r] = 0
        self._obs_dirty["ln"].add(int(r))
        self._mt_dirty["ln"][int(r)] = None
        self._mt_obs_reset["ln"].add(int(r))
        self._add_ln_obs(r, kf_slot, sf, ef)
        self.invalidate("ln_spos", "ln_epos", "ln_status", "ln_anchor_kf",
                        "ln_anchor_suv", "ln_anchor_euv", "ln_anchor_sf",
                        "ln_anchor_ef", "ln_anchor_level", "ln_obs_kf",
                        "ln_obs_sf", "ln_obs_ef")
        return r

    def scene_depth(self, frame: FrameState):
        """Median + min depth of the frame's landmark observations
        (reference: frame_utils::getSceneDepth, frame.cpp:182-217).
        Vectorized: the per-landmark Python loop cost ~0.5-1 ms per frame
        on the wall-clock hot path."""
        R, t = frame.R_f_w, frame.t_f_w
        Rz, tz = R[2], t[2]  # only the z row is needed
        parts = []
        pv = frame.pt_valid & (frame.pt_lm >= 0)
        if pv.any():
            z = self.pt_pos[frame.pt_lm[pv]] @ Rz + tz
            parts.append(z[z > 0])
        sv = frame.seg_valid & (frame.seg_lm >= 0)
        if sv.any():
            lm = frame.seg_lm[sv]
            for tbl in (self.ln_spos, self.ln_epos):
                z = tbl[lm] @ Rz + tz
                parts.append(z[z > 0])
        d = np.concatenate(parts) if parts else np.zeros(0)
        if len(d) == 0:
            return None, None
        return float(np.median(d)), float(d.min())

    def transform(self, R: np.ndarray, t: np.ndarray, s: float):
        """Global similarity transform of the whole map (map.cpp:228-257)."""
        self._mt_overflow = True  # map-wide change: carry must full-resync
        for k in np.where(self.kf_occupied)[0]:
            # T_f_w' = T_f_w * [R,t,s]^-1 with scale folded into translation
            Rk, tk = self.kf_R[k], self.kf_t[k]
            self.kf_R[k] = Rk @ R.T
            self.kf_t[k] = s * tk - Rk @ R.T @ t
        act = self.pt_status > 0
        self.pt_pos[act] = s * (self.pt_pos[act] @ R.T) + t
        actl = self.ln_status > 0
        self.ln_spos[actl] = s * (self.ln_spos[actl] @ R.T) + t
        self.ln_epos[actl] = s * (self.ln_epos[actl] @ R.T) + t


def validate_map(m: MapState) -> List[str]:
    """Consistency checker (reference: map_debug::mapValidation /
    frameValidation / pointValidation, src/map.cpp:461-529). Returns a list
    of violation strings; empty = consistent."""
    errs = []
    K = m.cfg.caps.max_kfs
    # keyframe feature tables must reference live landmarks
    for k in np.where(m.kf_occupied)[0]:
        for i, lm in enumerate(m.kf_pt_lm[k]):
            if lm >= 0 and m.pt_status[lm] == ST_DELETED:
                errs.append(f"kf{k} pt feature {i} -> deleted landmark {lm}")
        for i, lm in enumerate(m.kf_seg_lm[k]):
            if lm >= 0 and m.ln_status[lm] == ST_DELETED:
                errs.append(f"kf{k} seg feature {i} -> deleted landmark {lm}")
    # live landmarks must have a live anchor keyframe
    for r in np.where(m.pt_status > 0)[0]:
        a = m.pt_anchor_kf[r]
        if a < 0 or a >= K or not m.kf_occupied[a]:
            errs.append(f"point {r} anchor kf {a} not occupied")
    for r in np.where(m.ln_status > 0)[0]:
        a = m.ln_anchor_kf[r]
        if a < 0 or a >= K or not m.kf_occupied[a]:
            errs.append(f"line {r} anchor kf {a} not occupied")
    # obs slots must point at occupied keyframes
    for r in np.where(m.pt_status > 0)[0]:
        for k in m.pt_obs_kf[r]:
            if k >= 0 and not m.kf_occupied[k]:
                errs.append(f"point {r} obs kf {k} not occupied")
    # finite geometry
    if not np.isfinite(m.pt_pos[m.pt_status > 0]).all():
        errs.append("non-finite point positions")
    if not (np.isfinite(m.ln_spos[m.ln_status > 0]).all()
            and np.isfinite(m.ln_epos[m.ln_status > 0]).all()):
        errs.append("non-finite line positions")
    return errs


def map_statistics(m: MapState) -> dict:
    """map_debug::mapStatistics analogue."""
    return {
        "n_keyframes": int(m.kf_occupied.sum()),
        "n_points": int((m.pt_status > 0).sum()),
        "n_points_good": int((m.pt_status == ST_GOOD).sum()),
        "n_points_candidate": int((m.pt_status == ST_CANDIDATE).sum()),
        "n_lines": int((m.ln_status > 0).sum()),
        "n_lines_good": int((m.ln_status == ST_GOOD).sum()),
    }
