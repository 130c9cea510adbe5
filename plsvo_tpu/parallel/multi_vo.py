"""Batched multi-sequence VO runner: B full pipelines, ONE device program
per tracked frame step.

BASELINE.json config 4 ("many sequences vmapped/partitioned across chips of
one host"). Each sequence keeps its own host-side map/bookkeeping (cheap);
the expensive fused frame core (align -> reproject -> pose opt) runs
vmapped over the batch — and optionally shard_mapped over a device mesh so
B sequences cost one sequence's device wall-clock per chip.

Sequences still in bootstrap (FIRST/SECOND) or relocalizing run their own
staged path for that frame; once in DEFAULT they join the batch.
"""
from __future__ import annotations

from functools import partial
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
    (optionally mesh-sharded) dispatch."""

    def __init__(self, cam: PinholeCamera, cfg: Config, n_sequences: int,
                 mesh: Optional[jax.sharding.Mesh] = None, axis: str = "seq"):
        self.vos = [FrameHandlerMono(cam, cfg) for _ in range(n_sequences)]
        self.cam = cam
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self._batched_core = {}

    def _core_for(self, n: int, kwargs):
        key = (n, tuple(sorted((k, v) for k, v in kwargs.items())))
        if key in self._batched_core:
            return self._batched_core[key]

        core = partial(fused.track_frame_step, **kwargs)

        def run(*batched_inputs):
            return jax.vmap(core)(*batched_inputs)

        if self.mesh is not None and n % self.mesh.shape[self.axis] == 0:
            spec = jax.sharding.PartitionSpec(self.axis)

            def sharded(*batched_inputs):
                in_specs = jax.tree.map(lambda _: spec, batched_inputs)
                fn = jax.shard_map(
                    run, mesh=self.mesh, in_specs=in_specs,
                    out_specs=jax.tree.map(lambda _: spec, jax.eval_shape(
                        run, *batched_inputs)),
                    check_vma=False)
                return fn(*batched_inputs)

            fn = jax.jit(sharded)
        else:
            fn = jax.jit(run)
        self._batched_core[key] = fn
        return fn

    def add_images(self, imgs: Sequence, timestamp: float):
        """One frame for every sequence. imgs: list/array of B images."""
        from plsvo_tpu.image import build_pyramid

        results = [None] * len(self.vos)
        default_idx = [
            i for i, vo in enumerate(self.vos) if vo.stage == STAGE_DEFAULT]
        other_idx = [i for i in range(len(self.vos)) if i not in default_idx]

        # non-DEFAULT sequences: staged per-sequence path
        for i in other_idx:
            results[i] = self.vos[i].add_image(imgs[i], timestamp)

        if default_idx:
            # the FULL frame step (incl. seed updates) batches when every
            # sequence agrees on the static flags; force the seed-update
            # stages ON once any sequence needs them (a no-alive table
            # just no-ops inside)
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
                inputs.append(vo._step_inputs(pyr))
            stacked = jax.tree.map(lambda *a: jnp.stack(a), *inputs)
            fn = self._core_for(len(default_idx), kwargs)
            step_b = fn(*stacked)
            # ONE fetch for every sequence's results + seed convergence;
            # seed tables stay device-resident, sliced back per sequence
            fetched = jax.device_get(
                (step_b.fused, step_b.pt_conv, step_b.ln_conv))
            res_f, pt_conv_b, ln_conv_b = fetched
            for k, i in enumerate(default_idx):
                vo = self.vos[i]
                vo.pt_seeds = jax.tree.map(lambda a: a[k], step_b.pt_seeds)
                if step_b.ln_seeds is not None:
                    vo.ln_seeds = jax.tree.map(
                        lambda a: a[k], step_b.ln_seeds)
                pt_c = (None if pt_conv_b is None
                        else jax.tree.map(lambda a: a[k], pt_conv_b))
                ln_c = (None if ln_conv_b is None
                        else jax.tree.map(lambda a: a[k], ln_conv_b))
                got = tuple(g for g in (pt_c, ln_c) if g is not None)
                vo._apply_harvest(got, pt_c is not None, ln_c is not None)
                res_k = jax.tree.map(lambda a: a[k], res_f)
                r = vo._post_fused(frames[k], res_k)
                vo.frame_id += 1
                vo.results.append(r)
                results[i] = r
        return results

    @property
    def stages(self):
        return [vo.stage for vo in self.vos]
