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

    def _core_for(self, n: int, specs, kwargs):
        key = (n, specs, tuple(sorted(kwargs.items())))
        if key in self._batched_core:
            return self._batched_core[key]

        core = partial(fused.track_frame_core_blob, specs=specs, **kwargs)

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
            kwargs = self.vos[default_idx[0]]._fused_kwargs()
            inputs = []
            frames = []
            for i in default_idx:
                vo = self.vos[i]
                # collect the previous frame's converged seeds before this
                # frame's core consumes the map tables
                vo._harvest_seeds()
                pyr = build_pyramid(jnp.asarray(np.asarray(imgs[i]),
                                                jnp.float32), vo.n_levels)
                last = vo.last_frame
                frames.append(FrameState.empty(
                    vo.cfg, vo.frame_id, timestamp, pyr,
                    last.R_f_w.copy(), last.t_f_w.copy()))
                inputs.append(vo._fused_inputs(pyr))
            stacked = jax.tree.map(lambda *a: jnp.stack(a), *inputs)
            fn = self._core_for(len(default_idx),
                                self.vos[default_idx[0]]._blob_specs(), kwargs)
            res_b = fn(*stacked)
            fetched = jax.device_get(res_b)
            for k, i in enumerate(default_idx):
                vo = self.vos[i]
                res_k = jax.tree.map(lambda a: a[k], fetched)
                r = vo._post_fused(frames[k], res_k)
                vo.frame_id += 1
                vo.results.append(r)
                results[i] = r
        return results

    @property
    def stages(self):
        return [vo.stage for vo in self.vos]
