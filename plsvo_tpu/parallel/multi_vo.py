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

Sequences still in bootstrap (FIRST/SECOND) or relocalizing run their own
staged path for that frame; once in DEFAULT they join the batch.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config
from plsvo_tpu.pipeline import fused
from plsvo_tpu.pipeline.frame_handler import STAGE_DEFAULT, FrameHandlerMono
from plsvo_tpu.pipeline.state import FrameState


class BatchedVO:
    """Drives B sequences; DEFAULT-stage frames execute as one vmapped
    dispatch (optionally sharded over a mesh by the caller's jit config)."""

    def __init__(self, cam: PinholeCamera, cfg: Config, n_sequences: int,
                 mesh: Optional[jax.sharding.Mesh] = None, axis: str = "seq"):
        self.vos = [FrameHandlerMono(cam, cfg) for _ in range(n_sequences)]
        self.cam = cam
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        # stacked device-resident seed tables for the current batch members
        self._seeds_idx: Optional[tuple] = None
        self._pt_stack = None
        self._ln_stack = None

    # -- stacked-seed bookkeeping ---------------------------------------
    def _materialize_seeds(self):
        """Write the stacked tables back into the member vos (used when
        batch membership changes or a vo leaves for the staged path)."""
        if self._seeds_idx is None:
            return
        for k, i in enumerate(self._seeds_idx):
            vo = self.vos[i]
            vo.pt_seeds = jax.tree.map(lambda a: a[k], self._pt_stack)
            vo.ln_seeds = jax.tree.map(lambda a: a[k], self._ln_stack)
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

    def add_images(self, imgs: Sequence, timestamp: float):
        """One frame for every sequence. imgs: list/array of B images."""
        from plsvo_tpu.image import build_pyramid

        results = [None] * len(self.vos)
        default_idx = [
            i for i, vo in enumerate(self.vos) if vo.stage == STAGE_DEFAULT]
        other_idx = [i for i in range(len(self.vos)) if i not in default_idx]

        # non-DEFAULT sequences: staged per-sequence path (needs their own
        # seed tables back first)
        if other_idx and self._seeds_idx is not None and any(
                i in self._seeds_idx for i in other_idx):
            self._materialize_seeds()
        for i in other_idx:
            results[i] = self.vos[i].add_image(imgs[i], timestamp)

        if not default_idx:
            return results

        self._ensure_stack(default_idx)
        # static flags must agree across the batch: force the seed stages
        # ON when any member needs them (a no-alive table just no-ops)
        kwargs = self.vos[default_idx[0]]._step_kwargs()
        kwargs["update_pt_seeds"] = any(
            self.vos[i]._seed_alive.any() for i in default_idx)
        kwargs["update_ln_seeds"] = bool(
            self.cfg.pipeline.has_ls and any(
                self.vos[i]._any_line_seeds for i in default_idx))

        inputs = []
        frames = []
        for i in default_idx:
            vo = self.vos[i]
            pyr = build_pyramid(jnp.asarray(np.asarray(imgs[i]),
                                            jnp.float32), vo.n_levels)
            last = vo.last_frame
            frames.append(FrameState.empty(
                vo.cfg, vo.frame_id, timestamp, pyr,
                last.R_f_w.copy(), last.t_f_w.copy()))
            pl = vo.cfg.pipeline
            inputs.append((
                last.pyr, pyr, vo.map.kf_pyr[: pl.n_pyr_levels],
                vo._last_blob(last), vo._map_tables(),
                jnp.asarray(vo.batch_counter, jnp.int32)))

        cam = self.cam
        mesh = None
        if self.mesh is not None and \
                len(default_idx) % self.mesh.shape[self.axis] == 0:
            mesh = self.mesh
        step_b = fused.track_frame_step_list(
            tuple(inputs), self._pt_stack, self._ln_stack,
            cam.fx, cam.fy, cam.cx, cam.cy,
            mesh=mesh, mesh_axis=self.axis, **kwargs)
        # seed tables stay stacked on device for the next frame
        self._pt_stack = step_b.pt_seeds
        self._ln_stack = step_b.ln_seeds

        # ONE fetch: every sequence's results + seed convergence
        res_f, pt_conv_b, ln_conv_b = jax.device_get(
            (step_b.fused, step_b.pt_conv, step_b.ln_conv))

        for k, i in enumerate(default_idx):
            vo = self.vos[i]
            pt_c = (None if pt_conv_b is None
                    else jax.tree.map(lambda a: a[k], pt_conv_b))
            ln_c = (None if ln_conv_b is None
                    else jax.tree.map(lambda a: a[k], ln_conv_b))
            got = tuple(g for g in (pt_c, ln_c) if g is not None)
            vo._apply_harvest(got, pt_c is not None, ln_c is not None)
            # keyframe seed init must read/write THIS vo's rows of the
            # stacked tables (rare: only on keyframes)
            self._install_seed_hooks(vo, k)
            try:
                res_k = jax.tree.map(lambda a: a[k], res_f)
                r = vo._post_fused(frames[k], res_k)
            finally:
                self._remove_seed_hooks(vo)
            vo.frame_id += 1
            vo.results.append(r)
            results[i] = r
        return results

    def _install_seed_hooks(self, vo: FrameHandlerMono, k: int):
        def get():
            return (jax.tree.map(lambda a: a[k], self._pt_stack),
                    jax.tree.map(lambda a: a[k], self._ln_stack))

        def set_(pt, ln):
            self._pt_stack = jax.tree.map(
                lambda S, v: S.at[k].set(v), self._pt_stack, pt)
            self._ln_stack = jax.tree.map(
                lambda S, v: S.at[k].set(v), self._ln_stack, ln)

        vo._get_seed_tables = get
        vo._set_seed_tables = set_

    @staticmethod
    def _remove_seed_hooks(vo: FrameHandlerMono):
        for name in ("_get_seed_tables", "_set_seed_tables"):
            vo.__dict__.pop(name, None)

    @property
    def stages(self):
        return [vo.stage for vo in self.vos]
