"""Batched multi-sequence VO: the tracking front-end over many sequences at
once, data-parallel across the chips of a mesh.

BASELINE.json config 4 — no reference analogue (the reference processes one
sequence per process, SURVEY §2.3). The numeric frame step (sparse image
alignment; the pipeline's dominant cost) is vmapped over a sequence axis
and sharded over the mesh with shard_map, so B sequences cost one
sequence's wall-clock per chip. Host-side per-sequence control flow
(keyframe policy etc.) stays per-sequence and cheap.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from plsvo_tpu.ops import sparse_align


def _align_one(pyr_ref, pyr_cur, pts, segs, R0, t0, fx, fy, cx, cy,
               levels, n_iter, patch_size):
    res = sparse_align.sparse_img_align(
        pyr_ref, pyr_cur, pts, segs, R0, t0, fx, fy, cx, cy,
        levels=levels, n_iter=n_iter, patch_size=patch_size)
    return res.R, res.t, res.n_tracked_pts, res.n_tracked_segs, res.seg_alive


@partial(jax.jit, static_argnames=("levels", "n_iter", "patch_size"))
def batched_sparse_align(
    pyr_ref: Sequence[jnp.ndarray],  # list over levels of (B, h_l, w_l)
    pyr_cur: Sequence[jnp.ndarray],
    pts: sparse_align.AlignPoints,  # leading dim B on every leaf
    segs: sparse_align.AlignSegments,
    R0: jnp.ndarray,  # (B,3,3)
    t0: jnp.ndarray,  # (B,3)
    fx, fy, cx, cy,  # scalars (shared camera) — broadcast
    *,
    levels: Tuple[int, ...] = (4, 3, 2),
    n_iter: int = 30,
    patch_size: int = 4,
):
    """vmap the whole coarse-to-fine alignment over B sequences."""
    fn = partial(_align_one, fx=fx, fy=fy, cx=cx, cy=cy, levels=levels,
                 n_iter=n_iter, patch_size=patch_size)
    return jax.vmap(fn)(list(pyr_ref), list(pyr_cur), pts, segs, R0, t0)


def sharded_sparse_align(
    mesh: Mesh,
    axis: str,
    pyr_ref, pyr_cur, pts, segs, R0, t0, fx, fy, cx, cy,
    *,
    levels: Tuple[int, ...] = (4, 3, 2),
    n_iter: int = 30,
    patch_size: int = 4,
):
    """Same as batched_sparse_align but with the B axis sharded over the
    mesh: each device aligns B/n_dev sequences; no cross-device comms are
    needed (pure data parallelism over ICI-connected chips)."""
    spec_leaf = P(axis)

    def run(pr, pc, p, s, R, t):
        out = batched_sparse_align(
            pr, pc, p, s, R, t, fx, fy, cx, cy,
            levels=levels, n_iter=n_iter, patch_size=patch_size)
        return out

    n_leaves_in = (list(pyr_ref), list(pyr_cur), pts, segs, R0, t0)
    in_specs = jax.tree.map(lambda _: spec_leaf, n_leaves_in)
    shard_fn = jax.shard_map(
        run, mesh=mesh,
        in_specs=in_specs,
        out_specs=(spec_leaf,) * 5,
        # pure data parallelism, no collectives: skip varying-axis checking
        # (literal-initialized while_loop carries trip the vma tracker)
        check_vma=False)
    return jax.jit(shard_fn)(*n_leaves_in)
