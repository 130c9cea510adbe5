"""Batched pyramidal KLT tracking for bootstrap.

TPU-native replacement for cv::calcOpticalFlowPyrLK as used by
KltHomographyInit::trackKlt (reference: src/initialization.cpp:170-215,
30px window, 4 levels, 30 iterations). We reuse the inverse-compositional
align2d machinery per level, coarse-to-fine, all features in one batch.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from plsvo_tpu.image import extract_patches
from plsvo_tpu.ops.feature_align import align2d, ref_patch_gradients


@partial(jax.jit, static_argnames=("patch_size", "n_iter"))
def track_klt(
    pyr_ref: Sequence[jnp.ndarray],
    pyr_cur: Sequence[jnp.ndarray],
    uv_ref: jnp.ndarray,  # (N,2) level-0 positions in ref
    valid: jnp.ndarray,  # (N,)
    *,
    patch_size: int = 12,
    n_iter: int = 30,
):
    """Track features from ref to cur. Returns (uv_cur, ok, disparity).

    Coarse-to-fine over all pyramid levels; at each level the reference
    patch is re-extracted from the ref pyramid at the feature's (fixed)
    position and align2d refines the current estimate."""
    n_levels = len(pyr_ref)
    uv_cur = uv_ref
    ok = valid
    for lvl in range(n_levels - 1, -1, -1):
        scale = 1.0 / (1 << lvl)
        pb, pb_ok = extract_patches(pyr_ref[lvl], uv_ref * scale, patch_size + 2)
        ref_patch, dx, dy = ref_patch_gradients(pb, patch_size)
        res = align2d(
            pyr_cur[lvl], ref_patch, dx, dy, uv_cur * scale,
            valid & pb_ok, patch_size=patch_size, n_iter=n_iter)
        # keep the refinement where it converged; propagate estimate anyway
        uv_cur = jnp.where(res.converged[:, None], res.uv / scale, uv_cur)
        if lvl == 0:
            ok = valid & res.converged & pb_ok
    disparity = jnp.linalg.norm(uv_cur - uv_ref, axis=-1)
    return uv_cur, ok, disparity
