"""Batched subpixel feature alignment (inverse-compositional KLT).

TPU-native rebuild of the reference's per-feature aligners
(reference: src/feature_alignment.cpp — align1D :41-158, align2D :160-290,
plus hand-written SSE2/NEON variants :294+). One call aligns ALL candidate
features at once; the SIMD variants are unnecessary because the batch axis
IS the vector axis on TPU.

Parity notes:
- inverse compositional with ref-patch gradients precomputed once
- 3-parameter model (u, v, mean_diff) for align2D; 2-parameter
  (dist-along-direction, mean_diff) for align1D (edgelets / line endpoints)
- fixed iteration budget (subpix_n_iter=10), convergence at 0.03 px
  (feature_alignment.cpp: converged when update norm < 0.03)
- per-feature convergence mask instead of early-exit branches
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from plsvo_tpu.batlin import inv2x2, inv3x3
from plsvo_tpu.image import bilinear_sample, patch_offsets


class AlignOut(NamedTuple):
    uv: jnp.ndarray  # (N, 2) refined positions (same level coords as input)
    converged: jnp.ndarray  # (N,) bool
    mean_diff: jnp.ndarray  # (N,) photometric offset estimate


def ref_patch_gradients(ref_patch_with_border: jnp.ndarray, patch_size: int):
    """Central-difference gradients of the interior patch from a
    (patch_size+2)^2 bordered patch (reference: feature_alignment.cpp:179-196
    computes dx,dy from patch_with_border)."""
    B = patch_size + 2
    p = ref_patch_with_border.reshape(-1, B, B)
    dx = 0.5 * (p[:, 1:-1, 2:] - p[:, 1:-1, :-2])
    dy = 0.5 * (p[:, 2:, 1:-1] - p[:, :-2, 1:-1])
    interior = p[:, 1:-1, 1:-1]
    P = patch_size * patch_size
    return interior.reshape(-1, P), dx.reshape(-1, P), dy.reshape(-1, P)


@partial(jax.jit, static_argnames=("patch_size", "n_iter"))
def align2d(
    cur_img: jnp.ndarray,
    ref_patch: jnp.ndarray,  # (N, P) interior intensities
    ref_dx: jnp.ndarray,  # (N, P)
    ref_dy: jnp.ndarray,  # (N, P)
    uv_init: jnp.ndarray,  # (N, 2) in cur_img coords
    valid: jnp.ndarray,  # (N,)
    *,
    patch_size: int = 8,
    n_iter: int = 10,
    conv_eps: float = 0.03,
) -> AlignOut:
    """Refine each feature position by IC-KLT with (u, v, mean_diff)."""
    N, P = ref_patch.shape
    f32 = jnp.float32
    offs = patch_offsets(patch_size, f32)  # (P,2)

    # H = sum_p J Jᵀ with J = [dx, dy, 1]  (feature_alignment.cpp:198-209)
    ones = jnp.ones_like(ref_dx)
    J = jnp.stack([ref_dx, ref_dy, ones], axis=-1)  # (N,P,3)
    H = jnp.einsum("npi,npj->nij", J, J)
    Hinv = inv3x3(H, 1e-6)

    def cond(carry):
        it, uv, mean_diff, conv, active_any = carry
        return (it < n_iter) & active_any

    def body(carry):
        it, uv, mean_diff, conv, _ = carry
        pos = uv[:, None, :] + offs[None]
        I_cur, ok = bilinear_sample(cur_img, pos)  # (N,P)
        in_frame = jnp.all(ok, axis=-1)
        r = I_cur - ref_patch + mean_diff[:, None]  # (N,P)
        b = jnp.einsum("npi,np->ni", J, r)  # (N,3)
        upd = jnp.einsum("nij,nj->ni", Hinv, b)  # (N,3)
        active = valid & in_frame & jnp.logical_not(conv)
        # inverse compositional: position moves against the update
        uv_new = jnp.where(active[:, None], uv - upd[:, :2], uv)
        md_new = jnp.where(active, mean_diff - upd[:, 2], mean_diff)
        conv_new = conv | (active & (jnp.linalg.norm(upd[:, :2], axis=-1) < conv_eps))
        # all features converged or dead -> stop the whole batch early
        # (typical convergence is 3-4 iterations at the 0.03px threshold;
        # the reference early-exits per feature, feature_alignment.cpp:282)
        still = jnp.any(valid & in_frame & jnp.logical_not(conv_new))
        return (it + 1, uv_new, md_new, conv_new, still)

    init = (jnp.zeros((), jnp.int32), uv_init.astype(f32),
            jnp.zeros((N,), f32), jnp.zeros((N,), bool),
            jnp.asarray(True))
    _, uv, md, conv, _ = jax.lax.while_loop(cond, body, init)
    # a feature that wandered out of frame is failed
    pos = uv[:, None, :] + offs[None]
    _, ok = bilinear_sample(cur_img, pos)
    return AlignOut(uv=uv, converged=conv & valid & jnp.all(ok, axis=-1), mean_diff=md)


@partial(jax.jit, static_argnames=("patch_size", "n_iter"))
def align1d(
    cur_img: jnp.ndarray,
    ref_patch: jnp.ndarray,
    ref_dx: jnp.ndarray,
    ref_dy: jnp.ndarray,
    uv_init: jnp.ndarray,
    direction: jnp.ndarray,  # (N,2) unit search direction
    valid: jnp.ndarray,
    *,
    patch_size: int = 8,
    n_iter: int = 10,
    conv_eps: float = 0.03,
) -> AlignOut:
    """Refine along a 1D direction (edgelets; reference align1D,
    feature_alignment.cpp:41-158)."""
    N, P = ref_patch.shape
    f32 = jnp.float32
    offs = patch_offsets(patch_size, f32)
    d = direction / jnp.maximum(jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-8)
    dgrad = ref_dx * d[:, 0:1] + ref_dy * d[:, 1:2]  # (N,P)
    ones = jnp.ones_like(dgrad)
    J = jnp.stack([dgrad, ones], axis=-1)  # (N,P,2)
    H = jnp.einsum("npi,npj->nij", J, J)
    Hinv = inv2x2(H, 1e-6)

    def cond(carry):
        it, dist, mean_diff, conv, active_any = carry
        return (it < n_iter) & active_any

    def body(carry):
        it, dist, mean_diff, conv, _ = carry
        uv = uv_init + dist[:, None] * d
        pos = uv[:, None, :] + offs[None]
        I_cur, ok = bilinear_sample(cur_img, pos)
        in_frame = jnp.all(ok, axis=-1)
        r = I_cur - ref_patch + mean_diff[:, None]
        b = jnp.einsum("npi,np->ni", J, r)
        upd = jnp.einsum("nij,nj->ni", Hinv, b)
        active = valid & in_frame & jnp.logical_not(conv)
        dist_new = jnp.where(active, dist - upd[:, 0], dist)
        md_new = jnp.where(active, mean_diff - upd[:, 1], mean_diff)
        conv_new = conv | (active & (jnp.abs(upd[:, 0]) < conv_eps))
        still = jnp.any(valid & in_frame & jnp.logical_not(conv_new))
        return (it + 1, dist_new, md_new, conv_new, still)

    init = (jnp.zeros((), jnp.int32), jnp.zeros((N,), f32),
            jnp.zeros((N,), f32), jnp.zeros((N,), bool), jnp.asarray(True))
    _, dist, md, conv, _ = jax.lax.while_loop(cond, body, init)
    uv = uv_init + dist[:, None] * d
    pos = uv[:, None, :] + offs[None]
    _, ok = bilinear_sample(cur_img, pos)
    return AlignOut(uv=uv, converged=conv & valid & jnp.all(ok, axis=-1), mean_diff=md)


@partial(jax.jit, static_argnames=("patch_size", "n_iter"))
def align1d_atlas(
    atlas: jnp.ndarray,
    x_off: jnp.ndarray,
    sizes: jnp.ndarray,
    ref_patch: jnp.ndarray,  # (N, P)
    ref_dx: jnp.ndarray,
    ref_dy: jnp.ndarray,
    uv_init: jnp.ndarray,  # (N,2) in each feature's OWN level coords
    direction: jnp.ndarray,  # (N,2) unit search direction (edge normal)
    level: jnp.ndarray,  # (N,) int32
    valid: jnp.ndarray,
    *,
    patch_size: int = 8,
    n_iter: int = 10,
    conv_eps: float = 0.03,
) -> AlignOut:
    """align1d with per-feature pyramid levels through the atlas + the
    window-prefetch trick of align2d_atlas (one gather before the loop,
    gather-free iterations). Used for EDGELET features — refinement moves
    only along the warped dominant-gradient direction (reference:
    Matcher::findMatchDirect EDGELET branch, matcher.cpp:191-207 +
    feature_alignment.cpp:41-158)."""
    from plsvo_tpu.image import (gather_patch_windows_atlas,
                                 sample_patch_windows)

    N, P = ref_patch.shape
    f32 = jnp.float32
    margin = 4
    wp = patch_size + 1 + 2 * margin
    wp += wp % 2
    d = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-8)
    dgrad = ref_dx * d[:, 0:1] + ref_dy * d[:, 1:2]
    ones = jnp.ones_like(dgrad)
    J = jnp.stack([dgrad, ones], axis=-1)  # (N,P,2)
    H = jnp.einsum("npi,npj->nij", J, J)
    Hinv = inv2x2(H, 1e-6)
    win, corner = gather_patch_windows_atlas(
        atlas, x_off, uv_init.astype(f32), level, wp)
    wh = (sizes[level, 1].astype(f32), sizes[level, 0].astype(f32))

    def cond(carry):
        it, dist, mean_diff, conv, active_any = carry
        return (it < n_iter) & active_any

    def body(carry):
        it, dist, mean_diff, conv, _ = carry
        uv = uv_init + dist[:, None] * d
        I_cur, in_frame = sample_patch_windows(win, corner, uv, patch_size,
                                               wh=wh)
        r = I_cur - ref_patch + mean_diff[:, None]
        b = jnp.einsum("npi,np->ni", J, r)
        upd = jnp.einsum("nij,nj->ni", Hinv, b)
        active = valid & in_frame & jnp.logical_not(conv)
        dist_new = jnp.where(active, dist - upd[:, 0], dist)
        md_new = jnp.where(active, mean_diff - upd[:, 1], mean_diff)
        conv_new = conv | (active & (jnp.abs(upd[:, 0]) < conv_eps))
        still = jnp.any(valid & in_frame & jnp.logical_not(conv_new))
        return (it + 1, dist_new, md_new, conv_new, still)

    init = (jnp.zeros((), jnp.int32), jnp.zeros((N,), f32),
            jnp.zeros((N,), f32), jnp.zeros((N,), bool), jnp.asarray(True))
    _, dist, md, conv, _ = jax.lax.while_loop(cond, body, init)
    uv = uv_init + dist[:, None] * d
    _, ok = sample_patch_windows(win, corner, uv, patch_size, wh=wh)
    return AlignOut(uv=uv, converged=conv & valid & ok, mean_diff=md)


@partial(jax.jit, static_argnames=("patch_size", "n_iter"))
def align2d_atlas(
    atlas: jnp.ndarray,  # (H, Wa) packed pyramid (image.pack_pyramid_atlas)
    x_off: jnp.ndarray,  # (L,)
    sizes: jnp.ndarray,  # (L,2)
    ref_patch: jnp.ndarray,  # (N, P)
    ref_dx: jnp.ndarray,
    ref_dy: jnp.ndarray,
    uv_init: jnp.ndarray,  # (N,2) in each feature's OWN level coords
    level: jnp.ndarray,  # (N,) int32
    valid: jnp.ndarray,
    *,
    patch_size: int = 8,
    n_iter: int = 10,
    conv_eps: float = 0.03,
) -> AlignOut:
    """align2d with per-feature pyramid levels resolved through the atlas.

    The current-frame patch is resampled from a per-feature prefetched
    window (image.gather_patch_windows_atlas): ONE gather before the loop,
    every GN iteration is gather-free (image.sample_patch_windows). A
    feature drifting further than the window margin from its initial
    position is masked invalid — same outcome as the reference when a
    patch leaves the image (feature_alignment.cpp boundary checks), and
    beyond the convergence basin of an 8x8 patch anyway."""
    from plsvo_tpu.image import (gather_patch_windows_atlas,
                                 sample_patch_windows)

    N, P = ref_patch.shape
    f32 = jnp.float32
    margin = 4
    wp = patch_size + 1 + 2 * margin
    wp += wp % 2
    ones = jnp.ones_like(ref_dx)
    J = jnp.stack([ref_dx, ref_dy, ones], axis=-1)
    H = jnp.einsum("npi,npj->nij", J, J)
    Hinv = inv3x3(H, 1e-6)
    win, corner = gather_patch_windows_atlas(
        atlas, x_off, uv_init.astype(f32), level, wp)
    wh = (sizes[level, 1].astype(f32), sizes[level, 0].astype(f32))

    def cond(carry):
        it, uv, mean_diff, conv, active_any = carry
        return (it < n_iter) & active_any

    def body(carry):
        it, uv, mean_diff, conv, _ = carry
        I_cur, in_frame = sample_patch_windows(win, corner, uv, patch_size,
                                               wh=wh)
        r = I_cur - ref_patch + mean_diff[:, None]
        b = jnp.einsum("npi,np->ni", J, r)
        upd = jnp.einsum("nij,nj->ni", Hinv, b)
        active = valid & in_frame & jnp.logical_not(conv)
        uv_new = jnp.where(active[:, None], uv - upd[:, :2], uv)
        md_new = jnp.where(active, mean_diff - upd[:, 2], mean_diff)
        conv_new = conv | (active & (jnp.linalg.norm(upd[:, :2], axis=-1) < conv_eps))
        still = jnp.any(valid & in_frame & jnp.logical_not(conv_new))
        return (it + 1, uv_new, md_new, conv_new, still)

    init = (jnp.zeros((), jnp.int32), uv_init.astype(f32),
            jnp.zeros((N,), f32), jnp.zeros((N,), bool), jnp.asarray(True))
    _, uv, md, conv, _ = jax.lax.while_loop(cond, body, init)
    _, ok = sample_patch_windows(win, corner, uv, patch_size, wh=wh)
    return AlignOut(uv=uv, converged=conv & valid & ok, mean_diff=md)


@partial(jax.jit, static_argnames=("patch_size", "n_iter", "backend"))
def align_mixed_atlas(
    atlas: jnp.ndarray,
    x_off: jnp.ndarray,
    sizes: jnp.ndarray,
    ref_patch: jnp.ndarray,  # (N, P)
    ref_dx: jnp.ndarray,
    ref_dy: jnp.ndarray,
    uv_init: jnp.ndarray,  # (N,2) own-level coords
    direction: jnp.ndarray,  # (N,2) 1-D search direction (rows with is_1d)
    is_1d: jnp.ndarray,  # (N,) bool — row refines 1-D along `direction`
    level: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    patch_size: int = 8,
    n_iter: int = 10,
    conv_eps: float = 0.03,
    backend: str = None,  # None=auto (Pallas on TPU), "pallas", "xla",
    #                       "pallas_interpret" (CPU equivalence tests)
) -> AlignOut:
    """ONE GN loop refining 2-D rows (u,v,mean_diff) and 1-D rows
    (dist-along-direction, mean_diff) together: the expensive per-iteration
    window resample is shared; only the (tiny) update projection differs
    per row. Replaces running align2d_atlas + align1d_atlas back to back
    on complementary masks.

    On TPU the whole GN loop runs as ONE Pallas kernel
    (ops/pallas_align.mixed_align_loop_pallas) — the XLA while_loop's ~15
    kernels/iteration collapse into a single launch with every
    intermediate in VMEM. The XLA loop remains the CPU/test backend and is
    mathematically identical (fixed-iteration predication vs early exit)."""
    from plsvo_tpu.image import (gather_patch_windows_atlas,
                                 sample_patch_windows)

    N, P = ref_patch.shape
    f32 = jnp.float32
    wp = 2 * ((patch_size + 8) // 2)  # P+1+2*margin rounded even (margin 3.5)
    ones = jnp.ones_like(ref_dx)
    J3 = jnp.stack([ref_dx, ref_dy, ones], axis=-1)  # (N,P,3)
    H3inv = inv3x3(jnp.einsum("npi,npj->nij", J3, J3), 1e-6)
    d = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-8)
    dgrad = ref_dx * d[:, 0:1] + ref_dy * d[:, 1:2]
    J1 = jnp.stack([dgrad, ones], axis=-1)  # (N,P,2)
    H1inv = inv2x2(jnp.einsum("npi,npj->nij", J1, J1), 1e-6)
    win, corner = gather_patch_windows_atlas(
        atlas, x_off, uv_init.astype(f32), level, wp)
    wh = (sizes[level, 1].astype(f32), sizes[level, 0].astype(f32))

    if backend is None:
        # measured on v5e at production sizes (N=768): the XLA while_loop
        # costs ~5-10 us/iteration with early exit — after the batched
        # closed-form H^-1 (batlin) removed the real prefix cost, the
        # fused-loop Pallas kernel (fixed n_iter) is ~0.2 ms SLOWER than
        # the XLA loop, so XLA is the default on every backend; the Pallas
        # kernel stays available (backend="pallas") with equivalence tests
        backend = "xla"
    if backend in ("pallas", "pallas_interpret"):
        from plsvo_tpu.ops.pallas_align import mixed_align_loop_pallas

        uv, conv, md = mixed_align_loop_pallas(
            win, corner, ref_patch, ref_dx, ref_dy, dgrad, H3inv, H1inv,
            d, is_1d, uv_init.astype(f32),
            jnp.stack([wh[0], wh[1]], -1), valid,
            patch_size=patch_size, wp=wp, n_iter=n_iter, conv_eps=conv_eps,
            interpret=(backend == "pallas_interpret"))
        return AlignOut(uv=uv, converged=conv, mean_diff=md)

    def cond(carry):
        it, uv, md, conv, active_any = carry
        return (it < n_iter) & active_any

    def body(carry):
        it, uv, md, conv, _ = carry
        I_cur, in_frame = sample_patch_windows(win, corner, uv, patch_size,
                                               wh=wh)
        r = I_cur - ref_patch + md[:, None]
        b3 = jnp.einsum("npi,np->ni", J3, r)
        u3 = jnp.einsum("nij,nj->ni", H3inv, b3)  # (N,3)
        b1 = jnp.einsum("npi,np->ni", J1, r)
        u1 = jnp.einsum("nij,nj->ni", H1inv, b1)  # (N,2)
        d_uv = jnp.where(is_1d[:, None], u1[:, 0:1] * d, u3[:, :2])
        d_md = jnp.where(is_1d, u1[:, 1], u3[:, 2])
        step = jnp.where(is_1d, jnp.abs(u1[:, 0]),
                         jnp.linalg.norm(u3[:, :2], axis=-1))
        active = valid & in_frame & jnp.logical_not(conv)
        uv_new = jnp.where(active[:, None], uv - d_uv, uv)
        md_new = jnp.where(active, md - d_md, md)
        conv_new = conv | (active & (step < conv_eps))
        still = jnp.any(valid & in_frame & jnp.logical_not(conv_new))
        return (it + 1, uv_new, md_new, conv_new, still)

    init = (jnp.zeros((), jnp.int32), uv_init.astype(f32),
            jnp.zeros((N,), f32), jnp.zeros((N,), bool), jnp.asarray(True))
    _, uv, md, conv, _ = jax.lax.while_loop(cond, body, init)
    _, ok = sample_patch_windows(win, corner, uv, patch_size, wh=wh)
    return AlignOut(uv=uv, converged=conv & valid & ok, mean_diff=md)
