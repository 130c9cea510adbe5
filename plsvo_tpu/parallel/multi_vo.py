"""Batched multi-sequence VO runner: B full pipelines, ONE device program
per tracked frame step.

BASELINE.json config 4 ("many sequences vmapped/partitioned across chips of
one host"). Each sequence keeps its own host-side map/bookkeeping (cheap);
the COMPLETE frame step — align -> reproject -> pose opt -> structure opt
-> depth-filter seed updates — runs vmapped over the batch inside one jit.

Dispatch discipline (the tunnel charges ~0.8 ms per eager op launch and
~25 ms per sync): per-sequence inputs are passed as separate pytrees and
stacked INSIDE the jit; the seed tables live STACKED on device across
frames and are materialized per sequence only when that sequence's host
path needs them (keyframe seed init, leaving the batch).

Pipelined mode (cfg.pipeline.pipelined): batched steps chain on device
through NextFrameInputs — frame i's batched step is dispatched BEFORE any
of frames i-1..i-depth+1 are fetched, and results are window-fetched every
pipeline_depth frames in ONE sync (including deferred keyframe
seed-detection results). This is the batched analogue of the single-seq
pipelined execution in FrameHandlerMono._process_frame_pipelined.

Sequences still in bootstrap (FIRST/SECOND) or relocalizing run their own
staged path for that frame; once in DEFAULT they join the batch.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config
from plsvo_tpu.pipeline import fused
from plsvo_tpu.pipeline.frame_handler import STAGE_DEFAULT, FrameHandlerMono
from plsvo_tpu.pipeline.state import FrameState


@partial(jax.jit, static_argnames=())
def _stack_row_get(stack, k):
    """Slice row k out of a stacked seed-table pytree in ONE dispatch
    (eager per-leaf slicing cost ~0.8 ms launch latency per leaf over the
    tunnel — ~26 leaves across both tables per keyframe)."""
    return jax.tree.map(lambda a: a[k], stack)


@partial(jax.jit, static_argnames=())
def _stack_row_set(stack, k, row):
    """Write row k of a stacked seed-table pytree in ONE dispatch."""
    return jax.tree.map(lambda S, v: S.at[k].set(v), stack, row)


class BatchedVO:
    """Drives B sequences on one or many chips. Two execution modes:

    - "vmap" (the default, and the only multi-chip path): ONE vmapped
      device program per frame over the whole batch, shard-mapped over a
      `mesh` (BASELINE.json config 4). The r5 carry design makes this the
      fastest single-chip mode too (measured 78-92 agg fps vs streams'
      69-77 across tunnel-weather bands): the whole batch's per-frame
      host->device traffic is one stacked image + one (B,2) scalar + one
      (B,L) map-delta upload, and per-keyframe detection/localBA batch
      into one padded program each per drain window. The vmapped step is
      ~1.1x additive on device (B=8: ~48 ms vs 8 x 5.4 ms single).
    - "streams": B independent pipelined frame-handler instances whose
      dispatches interleave on the device queue. Kept for comparison and
      for heterogeneous batches (different configs/cameras per stream),
      which the vmapped program cannot express.
    """

    def __init__(self, cam: PinholeCamera, cfg: Config, n_sequences: int,
                 mesh: Optional[jax.sharding.Mesh] = None, axis: str = "seq",
                 mode: str = "auto"):
        self.vos = [FrameHandlerMono(cam, cfg) for _ in range(n_sequences)]
        self.cam = cam
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        if mode == "auto":
            mode = "vmap"
        self.mode = mode
        self.pipelined = bool(cfg.pipeline.pipelined)
        self.depth = max(1, cfg.pipeline.pipeline_depth)
        for vo in self.vos:
            # vmap mode: a vo that falls out of the batch (bootstrap/
            # relocalization) runs its per-seq frames synchronously; in
            # pipelined mode its keyframe seed detection still defers into
            # OUR drain fetch. streams mode: each vo manages itself.
            vo._force_sync = self.mode != "streams"
            vo._defer_seed_init = self.pipelined and self.mode != "streams"
            if vo._defer_seed_init:
                # collect deferred KF detection + localBA requests and run
                # ONE padded vmapped program of each per drain window
                # instead of one ~6.5 ms detection + ~4 ms BA solve per
                # keyframe per sequence
                vo._queue_or_dispatch_detection = (
                    lambda frame, vo=vo: self._queue_detection(vo, frame))
                vo._solve_local_ba = (
                    lambda blob, spec: self._queue_ba(blob, spec))
        # queued keyframe-detection requests [(frame, occ_uv, occ_ok, ref)]
        self._det_q: List = []
        # queued localBA requests [(blob, spec, ref)]
        self._ba_q: List = []
        # stacked device-resident seed tables for the current batch members
        self._seeds_idx: Optional[tuple] = None
        self._pt_stack = None
        self._ln_stack = None
        # stacked device-resident MapTables carry (pipelined vmap mode):
        # per-frame host map changes ride ONE (B, L) delta upload
        self._mt_stack = None
        # pipelined mode: in-flight batched steps + finished result lists
        self._bq: List = []  # (default_idx, frames, step)
        self._bfetch_q: List = []  # in-flight fetch windows
        self._bready: List[list] = []
        # fetched-but-unprocessed window bookkeeping, drained in chunks of
        # _book_chunk frame-entries per add_images call so the device gets
        # fresh dispatches BETWEEN bookkeeping slices instead of idling
        # through one long drain (VERDICT r4 next #1: overlap the drain
        # bookkeeping with the next dispatch)
        self._bbook_q: List = []
        self._book_chunk = 2

    # -- stacked-seed bookkeeping ---------------------------------------
    def _materialize_seeds(self):
        """Write the stacked tables back into the member vos (used when
        batch membership changes or a vo leaves for the staged path)."""
        if self._seeds_idx is None:
            return
        for k, i in enumerate(self._seeds_idx):
            vo = self.vos[i]
            vo.pt_seeds = _stack_row_get(self._pt_stack, k)
            vo.ln_seeds = _stack_row_get(self._ln_stack, k)
        self._seeds_idx = None
        self._pt_stack = None
        self._ln_stack = None

    def _ensure_stack(self, idx):
        if self._seeds_idx == tuple(idx):
            return
        self._materialize_seeds()
        self._pt_stack = jax.tree.map(
            lambda *a: jnp.stack(a), *[self.vos[i].pt_seeds for i in idx])
        self._ln_stack = jax.tree.map(
            lambda *a: jnp.stack(a), *[self.vos[i].ln_seeds for i in idx])
        self._seeds_idx = tuple(idx)

    def _batch_kwargs(self, default_idx):
        """Static step kwargs unified across the batch — and PINNED so the
        whole run uses ONE program variant: every distinct static combo of
        the vmapped mega-step costs a multi-minute remote compile (or a
        multi-second cache load), and letting seed widths / stage flags
        drift with the batch state produced 6+ such stalls per 72-frame
        run (measured: 6-14 s each, destroying batched throughput)."""
        kwargs = self.vos[default_idx[0]]._step_kwargs()
        # static flags must agree across the batch AND stay constant: the
        # seed stages are forced ON (a no-alive table no-ops)
        kwargs["update_pt_seeds"] = True
        kwargs["update_ln_seeds"] = bool(self.cfg.pipeline.has_ls)
        # static seed widths must agree across the batch: take the max
        caps = self.cfg.caps
        pw = [self.vos[i]._live_width(self.vos[i]._seed_alive,
                                      caps.max_seeds, 128)
              for i in default_idx]
        lw = [self.vos[i]._live_width(self.vos[i]._lnseed_alive,
                                      caps.max_seed_segs, 64)
              for i in default_idx]
        # widths pinned to full capacity (None): ~0.4 ms/seq more device
        # time, zero extra program variants
        del pw, lw
        kwargs["pt_width"] = None
        kwargs["ln_width"] = None
        return kwargs

    def _mesh_for(self, default_idx):
        if self.mesh is not None and \
                len(default_idx) % self.mesh.shape[self.axis] == 0:
            return self.mesh
        return None

    def _new_frames(self, default_idx, imgs, timestamp):
        """Per-seq pyramids + empty FrameStates for this step."""
        from plsvo_tpu.image import build_pyramid

        frames = []
        pyrs = []
        for i in default_idx:
            vo = self.vos[i]
            pyr = build_pyramid(jnp.asarray(np.asarray(imgs[i]),
                                            jnp.float32), vo.n_levels)
            last = vo.last_frame
            frames.append(FrameState.empty(
                vo.cfg, vo.frame_id, timestamp, pyr,
                last.R_f_w.copy(), last.t_f_w.copy()))
            pyrs.append(pyr)
        return frames, pyrs

    def add_images(self, imgs: Sequence, timestamp: float):
        """One frame for every sequence. imgs: list/array of B images."""
        if self.mode == "streams":
            # B self-contained pipelines; their dispatches interleave on
            # the device queue, and each stream burst-fetches on its own
            # cadence (pipelined cfg) — host syncs amortize across streams.
            # (A stacked single-upload of all B images was A/B-tested and
            # measured CATASTROPHICALLY slower, 59 -> 10 agg fps: the
            # per-stream pyramid then consumes device slices of the stack,
            # which forces extra device copies / new program variants;
            # per-image uploads interleave with compute and win.)
            return [vo.add_image(imgs[i], timestamp)
                    for i, vo in enumerate(self.vos)]
        if self.pipelined:
            return self._add_images_pipelined(imgs, timestamp)
        results = [None] * len(self.vos)
        default_idx = [
            i for i, vo in enumerate(self.vos) if vo.stage == STAGE_DEFAULT]
        # the batch engages only at FULL membership: a partial batch would
        # compile its own program variant per batch size (each a huge
        # vmapped program); until every sequence reaches DEFAULT (or when
        # any falls out), all members run their small per-seq staged
        # programs, which are shared with single-sequence mode and already
        # compiled
        if len(default_idx) < len(self.vos):
            if self._seeds_idx is not None:
                self._materialize_seeds()
            for i in range(len(self.vos)):
                results[i] = self.vos[i].add_image(imgs[i], timestamp)
            return results
        other_idx = []

        if not default_idx:
            return results

        self._ensure_stack(default_idx)
        kwargs = self._batch_kwargs(default_idx)
        frames, pyrs = self._new_frames(default_idx, imgs, timestamp)
        inputs = []
        for k, i in enumerate(default_idx):
            vo = self.vos[i]
            pl = vo.cfg.pipeline
            # full (cached/invalidate-refreshed) tables ship each frame in
            # this synchronous mode — the carry deltas are redundant here
            vo.map.mt_mark_clean()
            inputs.append((
                vo.last_frame.pyr, pyrs[k], vo.map.kf_atlas_flat(pl.n_pyr_levels),
                vo._last_blob(vo.last_frame), vo._map_tables(),
                jnp.asarray(vo.batch_counter, jnp.int32)))

        cam = self.cam
        step_b = fused.track_frame_step_list(
            tuple(inputs), self._pt_stack, self._ln_stack,
            cam.fx, cam.fy, cam.cx, cam.cy,
            mesh=self._mesh_for(default_idx), mesh_axis=self.axis, **kwargs)
        # seed tables stay stacked on device for the next frame
        self._pt_stack = step_b.pt_seeds
        self._ln_stack = step_b.ln_seeds

        # ONE flat transfer: every sequence's results + seed convergence
        flat, meta = fused.flatpack(
            (fused.fetch_view(step_b.fused), step_b.pt_conv,
             step_b.ln_conv))
        res_f, pt_conv_b, ln_conv_b = fused.flatunpack(
            jax.device_get(flat), meta)

        for k, i in enumerate(default_idx):
            vo = self.vos[i]
            r = self._finish_one(vo, k, frames[k], res_f, pt_conv_b,
                                 ln_conv_b)
            vo.frame_id += 1
            vo.results.append(r)
            results[i] = r
        return results

    def _finish_one(self, vo, k, frame, res_f, pt_conv_b, ln_conv_b):
        """Slice sequence k out of fetched batch results and run the
        host bookkeeping for it."""
        pt_c = (None if pt_conv_b is None
                else jax.tree.map(lambda a: a[k], pt_conv_b))
        ln_c = (None if ln_conv_b is None
                else jax.tree.map(lambda a: a[k], ln_conv_b))
        got = tuple(g for g in (pt_c, ln_c) if g is not None)
        vo._apply_harvest(got, pt_c is not None, ln_c is not None,
                          result_frame_id=frame.frame_id)
        # keyframe seed init must read/write THIS vo's rows of the
        # stacked tables (rare: only on keyframes)
        self._install_seed_hooks(vo, k)
        try:
            res_k = jax.tree.map(lambda a: a[k], res_f)
            return vo._post_fused(frame, res_k)
        finally:
            self._remove_seed_hooks(vo)

    # -- pipelined batched mode -----------------------------------------
    def _add_images_pipelined(self, imgs, timestamp):
        """Dispatch the batched step for this frame, chained on device from
        the previous step; burst-fetch every `depth` frames."""
        results = [None] * len(self.vos)
        default_idx = [
            i for i, vo in enumerate(self.vos) if vo.stage == STAGE_DEFAULT]
        # membership changing (bootstrap finishing, relocalization) forces
        # a full drain: in-flight steps are only valid for their member set
        if self._bq and tuple(default_idx) != self._bq[-1][0]:
            self._drain_all_batched()
            default_idx = [i for i, vo in enumerate(self.vos)
                           if vo.stage == STAGE_DEFAULT]
        # full-membership gate (see add_images): a partial batch would be
        # its own huge program variant per size — run per-seq staged
        # programs until every sequence is DEFAULT
        if len(default_idx) < len(self.vos):
            if self._bq or self._bfetch_q:
                self._drain_all_batched()
            if self._seeds_idx is not None:
                self._materialize_seeds()
            for i in range(len(self.vos)):
                results[i] = self.vos[i].add_image(imgs[i], timestamp)
            return results
        other_idx = [i for i in range(len(self.vos)) if i not in default_idx]
        if other_idx:
            if self._bq or self._bfetch_q:
                self._drain_all_batched()
                default_idx = [i for i, vo in enumerate(self.vos)
                               if vo.stage == STAGE_DEFAULT]
                other_idx = [i for i in range(len(self.vos))
                             if i not in default_idx]
            if self._seeds_idx is not None and any(
                    i in self._seeds_idx for i in other_idx):
                self._materialize_seeds()
        for i in other_idx:
            results[i] = self.vos[i].add_image(imgs[i], timestamp)

        if default_idx:
            from plsvo_tpu.image import LazyPyr
            from plsvo_tpu.pipeline.state import FrameState

            self._ensure_stack(default_idx)
            kwargs = self._batch_kwargs(default_idx)
            cam = self.cam
            mesh = self._mesh_for(default_idx)
            if self._bq and any(self.vos[i].map._mt_overflow
                                for i in default_idx):
                # map-wide change (similarity transform) can't ride the
                # delta path: drain and restart with a full resync
                self._drain_all_batched()
            if not self._bq:
                # pipeline start: host blobs of the last finalized frames;
                # the full map upload IS the carry resync
                frames, pyrs = self._new_frames(default_idx, imgs,
                                                timestamp)
                inputs = []
                fids = []
                for k, i in enumerate(default_idx):
                    vo = self.vos[i]
                    pl = vo.cfg.pipeline
                    vo.map.mt_mark_clean()
                    inputs.append((
                        vo.last_frame.pyr, pyrs[k],
                        vo.map.kf_atlas_flat(pl.n_pyr_levels),
                        vo._last_blob(vo.last_frame), vo._map_tables(),
                        jnp.asarray(vo.batch_counter, jnp.int32)))
                    fids.append(np.int32(vo.frame_id))
                step_b = fused.track_frame_step_list(
                    tuple(inputs), self._pt_stack, self._ln_stack,
                    cam.fx, cam.fy, cam.cx, cam.cy,
                    mesh=mesh, mesh_axis=self.axis,
                    frame_ids=tuple(fids), emit_next=True, **kwargs)
            else:
                prev_step = self._bq[-1][2]
                kw_t = {k: v for k, v in kwargs.items() if k != "specs"}
                pl = self.cfg.pipeline
                inputs = []
                deltas = []
                bc_fid = np.zeros((len(default_idx), 2), np.int32)
                for k, i in enumerate(default_idx):
                    vo = self.vos[i]
                    inputs.append((
                        vo.map.kf_atlas_flat(pl.n_pyr_levels),))
                    bc_fid[k] = (vo.batch_counter, vo.frame_id)
                    deltas.append(vo.map.pack_mt_deltas(
                        fused.MT_DELTA_DP, fused.MT_DELTA_DL,
                        fused.MT_DELTA_OP, fused.MT_DELTA_OL,
                        fused.MT_DELTA_NE))
                # the WHOLE per-frame host->device traffic for B
                # sequences: one stacked image upload, one (B,2) scalar
                # upload, one (B,L) delta upload, ONE dispatch
                imgs_b = jnp.asarray(np.stack(
                    [np.asarray(imgs[i]) for i in default_idx]))
                step_b = fused.track_frame_step_tables_list(
                    tuple(inputs), imgs_b, jnp.asarray(bc_fid),
                    prev_step.next, self._mt_stack,
                    jnp.asarray(np.stack(deltas)),
                    self._pt_stack, self._ln_stack,
                    cam.fx, cam.fy, cam.cx, cam.cy,
                    n_levels=self.vos[default_idx[0]].n_levels,
                    mesh=mesh, mesh_axis=self.axis, **kw_t)
                # frames carry LAZY views into the step's stacked pyramid
                # (materialized per-seq only at keyframe installs)
                frames = []
                for k, i in enumerate(default_idx):
                    vo = self.vos[i]
                    last = vo.last_frame
                    frames.append(FrameState.empty(
                        vo.cfg, vo.frame_id, timestamp,
                        LazyPyr(step_b.next.pyr, k),
                        last.R_f_w.copy(), last.t_f_w.copy()))
            self._mt_stack = step_b.mt
            self._pt_stack = step_b.pt_seeds
            self._ln_stack = step_b.ln_seeds
            for k, i in enumerate(default_idx):
                self.vos[i].last_frame = frames[k]
                self.vos[i].frame_id += 1
            self._bq.append((tuple(default_idx), frames, step_b))
            if len(self._bq) > self.depth:
                self._initiate_drain_batched(keep=1)
        self._complete_drains_batched(force=len(self._bfetch_q) > 1)

        if self._bready:
            ready = self._bready.pop(0)
            for i, r in enumerate(ready):
                if results[i] is None:
                    results[i] = r
        return results

    def _queue_detection(self, vo: FrameHandlerMono, frame):
        """Record a deferred keyframe-detection request; returns a one-slot
        ref that _flush_detections fills with (stacked_result, row)."""
        occ_uv, occ_ok = vo._occupancy_inputs(frame)
        ref = [None]
        self._det_q.append((frame, occ_uv, occ_ok, ref))
        return ref

    def _flush_detections(self):
        """Dispatch every queued KF detection as B-padded vmapped rounds
        (ONE program per round; padding keeps a single compiled variant)."""
        from plsvo_tpu.pipeline.frame_handler import _kf_detect_program_batched

        B = len(self.vos)
        pl = self.cfg.pipeline
        n_pyr = max(pl.n_pyr_levels, pl.n_pyr_levels_segs)
        statics = self.vos[0]._detect_statics()
        while self._det_q:
            reqs = self._det_q[:B]
            del self._det_q[:len(reqs)]
            rr = reqs + [reqs[0]] * (B - len(reqs))
            pyrs = tuple(jnp.stack([r[0].pyr[l] for r in rr])
                         for l in range(n_pyr))
            occ_uv = jnp.asarray(np.stack([r[1] for r in rr]))
            occ_ok = jnp.asarray(np.stack([r[2] for r in rr]))
            out = _kf_detect_program_batched(pyrs, occ_uv, occ_ok, **statics)
            for row, r in enumerate(reqs):
                r[3][0] = (out, row)

    def _queue_ba(self, blob, spec):
        """Record a localBA solve request; _flush_bas fills the ref with
        (stacked_result, row)."""
        ref = [None]
        self._ba_q.append((blob, spec, ref))
        return ref

    def _flush_bas(self):
        """Solve queued same-spec localBA problems as B-padded vmapped
        rounds (one program per round per spec)."""
        from plsvo_tpu.parallel import ba as ba_mod

        if not self._ba_q:
            return
        B = len(self.vos)
        pl = self.cfg.pipeline
        by_spec = {}
        for blob, spec, ref in self._ba_q:
            by_spec.setdefault(spec, []).append((blob, ref))
        self._ba_q = []
        for spec, reqs in by_spec.items():
            while reqs:
                batch = reqs[:B]
                del reqs[:len(batch)]
                rr = batch + [batch[0]] * (B - len(batch))
                blobs = jnp.asarray(np.stack([b for b, _ in rr]))
                out3 = ba_mod.bundle_adjust_blob_batched(
                    blobs, spec=spec, n_iter=pl.loba_num_iter,
                    pose_prior=pl.loba_pose_prior, accept_gate=False)
                for row, (_, ref) in enumerate(batch):
                    ref[0] = (out3, row)

    @staticmethod
    def _route_handles(handles):
        """Split a handle list into plain device handles and refs into
        stacked grouped results; returns (plain, groups, routes)."""
        plain, groups, gids, routes = [], [], {}, []
        for h in handles:
            if isinstance(h, list):  # token ref -> (stacked_obj, row)
                obj, row = h[0]
                gid = gids.setdefault(id(obj), len(groups))
                if gid == len(groups):
                    groups.append(obj)
                routes.append(("grp", gid, row))
            else:
                routes.append(("plain", len(plain)))
                plain.append(h)
        return plain, groups, routes

    @staticmethod
    def _resolve_routes(routes, plain_got, groups_got):
        out = []
        for route in routes:
            if route[0] == "plain":
                out.append(plain_got[route[1]])
            else:
                _, gid, row = route
                out.append(jax.tree.map(lambda a: a[row], groups_got[gid]))
        return out

    def _initiate_drain_batched(self, keep: int):
        """Stage 1: ONE flat concat of the oldest in-flight batched steps
        (+ deferred keyframe seed-detection results) handed to the
        background fetch thread (see FrameHandlerMono._initiate_drain —
        each device_get round-trip costs ~80 ms over the tunnel, so one
        concat per window, fetched off-thread)."""
        n = len(self._bq) - keep
        if n <= 0:
            return
        self._flush_detections()
        self._flush_bas()
        take = [self._bq.pop(0) for _ in range(n)]
        # deferred KF seed inits + localBA results from the previous window
        # (vo rows recorded at dispatch time) — all ride the ONE window fetch
        pend = []
        pend_ba = []
        for i, vo in enumerate(self.vos):
            for ent in vo._pending_seed_init:
                pend.append((i, ent))
            vo._pending_seed_init = []
            for ent in vo._pending_ba:
                pend_ba.append((i, ent))
            vo._pending_ba = []
        # cap BA entries per window (bounds the _concat_f32 leaf-signature
        # space — see FrameHandlerMono._initiate_drain); overflow entries
        # go back to their vo and ride the next window
        for i, ent in pend_ba[4:]:
            self.vos[i]._pending_ba.append(ent)
        pend_ba = pend_ba[:4]
        # seed-init / BA handles: plain per-vo device tuples OR refs into
        # a stacked batched result (each stacked result packed ONCE; rows
        # sliced from the fetched numpy tree at completion)
        plain, det_groups, routes = self._route_handles(
            [h for (_, (_, _, _, h)) in pend])
        ba_plain, ba_groups, ba_routes = self._route_handles(
            [h for (_, (h, _)) in pend_ba])
        flat, meta = fused.flatpack((
            [(fused.fetch_view(s.fused), s.pt_conv, s.ln_conv)
             for _, _, s in take],
            plain, det_groups, ba_plain, ba_groups))
        fut = fused.submit_fetch(flat)
        self._bfetch_q.append(
            ([(didx, frames) for (didx, frames, _) in take],
             pend, routes, pend_ba, ba_routes, fut, meta))

    def _complete_drains_batched(self, force: bool):
        """Stage 2a: unpack arrived windows. BA write-backs and seed inits
        apply immediately (small); the per-frame bookkeeping is queued and
        processed in bounded CHUNKS by subsequent add_images calls
        (stage 2b) so the device receives fresh dispatches between slices
        instead of idling through one long serial drain (VERDICT r4 next
        #1: overlap the drain bookkeeping with the next dispatch).
        Deterministic — the chunk schedule depends only on call order."""
        from plsvo_tpu.parallel import ba as ba_mod

        while self._bfetch_q and force:
            (entries, pend, routes, pend_ba, ba_routes, fut,
             meta) = self._bfetch_q.pop(0)
            got, plain_got, groups_got, ba_plain_got, ba_groups_got = \
                fused.flatunpack(fut.result(), meta)
            ba_got = self._resolve_routes(ba_routes, ba_plain_got,
                                          ba_groups_got)
            for (i, (_, bmeta)), (kf_R, kf_t, lm_pos) in zip(pend_ba, ba_got):
                ba_mod.write_back_window(self.vos[i].map, kf_R, kf_t, lm_pos,
                                         bmeta)
            init_got = self._resolve_routes(routes, plain_got, groups_got)
            for (i, (kf_slot, dm, dmin, _)), fetched in zip(pend, init_got):
                vo = self.vos[i]
                if self._seeds_idx is not None and i in self._seeds_idx:
                    self._install_seed_hooks(vo, self._seeds_idx.index(i))
                    try:
                        vo._complete_seed_init(kf_slot, dm, dmin, *fetched)
                    finally:
                        self._remove_seed_hooks(vo)
                else:
                    vo._complete_seed_init(kf_slot, dm, dmin, *fetched)
            for (didx, frames), (res_f, ptc_b, lnc_b) in zip(entries, got):
                self._bbook_q.append((didx, frames, res_f, ptc_b, lnc_b))
            force = False
        self._process_book_chunk(self._book_chunk)

    def _process_book_chunk(self, n: int):
        """Stage 2b: run host bookkeeping for up to n fetched frames."""
        while n and self._bbook_q:
            didx, frames, res_f, ptc_b, lnc_b = self._bbook_q.pop(0)
            rs = [None] * len(self.vos)
            for k, i in enumerate(didx):
                vo = self.vos[i]
                if vo.stage != STAGE_DEFAULT:
                    continue  # successors of a failed frame: poisoned
                r = self._finish_one(vo, k, frames[k], res_f, ptc_b, lnc_b)
                vo.results.append(r)
                rs[i] = r
            self._bready.append(rs)
            n -= 1
            if not self._bbook_q and self._bq:
                # _post_fused pointed last_frame at each finalized frame;
                # the newest dispatched frame stays the alignment reference
                didx2, frames2 = self._bq[-1][0], self._bq[-1][1]
                for k, i in enumerate(didx2):
                    if self.vos[i].stage == STAGE_DEFAULT:
                        self.vos[i].last_frame = frames2[k]

    def _drain_all_batched(self):
        self._initiate_drain_batched(keep=0)
        while self._bfetch_q:
            self._complete_drains_batched(force=True)
        while self._bbook_q:
            self._process_book_chunk(len(self._bbook_q))
        # carry is only valid for an unbroken chain: next batch start
        # resyncs from the (now fully caught-up) host mirrors
        self._mt_stack = None

    def flush(self):
        """Drain all in-flight pipelined frames (call at sequence end).
        Returns the remaining per-call result lists in order."""
        if self.mode == "streams":
            tails = [vo.flush() for vo in self.vos]
            depth = max((len(t) for t in tails), default=0)
            return [[t[d] if d < len(t) else None for t in tails]
                    for d in range(depth)]
        if self._bq or self._bfetch_q:
            self._drain_all_batched()
        # BAs dispatched in the final window: ONE flat fetch for ALL vos'
        # tails (per-vo _complete_pending_ba would pay the ~80 ms tunnel
        # round-trip N times at flush)
        from plsvo_tpu.parallel import ba as ba_mod

        self._flush_bas()  # resolve any still-queued solve requests
        pend = [(vo, ent) for vo in self.vos for ent in vo._pending_ba]
        for vo in self.vos:
            vo._pending_ba = []
        if pend:
            plain, groups, routes = self._route_handles(
                [h for (_, (h, _)) in pend])
            flat, fmeta = fused.flatpack((plain, groups))
            plain_got, groups_got = fused.flatunpack(
                jax.device_get(flat), fmeta)
            fetched = self._resolve_routes(routes, plain_got, groups_got)
            for (vo, (_, meta)), (kf_R, kf_t, lm_pos) in zip(pend, fetched):
                ba_mod.write_back_window(vo.map, kf_R, kf_t, lm_pos, meta)
        out = self._bready
        self._bready = []
        return out

    def _install_seed_hooks(self, vo: FrameHandlerMono, k: int):
        def get():
            return (_stack_row_get(self._pt_stack, k),
                    _stack_row_get(self._ln_stack, k))

        def set_(pt, ln):
            self._pt_stack = _stack_row_set(self._pt_stack, k, pt)
            self._ln_stack = _stack_row_set(self._ln_stack, k, ln)

        vo._get_seed_tables = get
        vo._set_seed_tables = set_

    @staticmethod
    def _remove_seed_hooks(vo: FrameHandlerMono):
        for name in ("_get_seed_tables", "_set_seed_tables"):
            vo.__dict__.pop(name, None)

    @property
    def stages(self):
        return [vo.stage for vo in self.vos]
