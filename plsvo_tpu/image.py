"""Image pyramid + sampling primitives.

TPU-native replacement for vk::halfSample / vk::interpolateMat_8u /
vk::shiTomasiScore and the reference pyramid construction
(reference: src/frame.cpp:171-180 createImgPyramid; SURVEY §2.2).

Conventions: images are (H, W) float32 arrays in [0, 255] (the reference
works on 8-bit grayscale; keeping the 0..255 range preserves all its
intensity thresholds, e.g. the segment drop threshold 200 in
src/sparse_img_align.cpp:668). Pixel coordinate (u, v) = (x, y) = (col, row);
integer coordinates refer to pixel centers, matching the reference's
`img.at<u8>(v, u)` addressing.

All sampling functions broadcast over leading batch dims: one call gathers
every patch of every feature — that is the whole point of the TPU design
(SoA + batched gathers instead of the reference's per-feature loops).
"""
from __future__ import annotations

from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp


def half_sample(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 box-filter downsample (vk::halfSample analogue, src/frame.cpp:178).

    Odd trailing rows/cols are dropped, as in vikit."""
    H, W = img.shape[-2], img.shape[-1]
    h2, w2 = H // 2, W // 2
    x = img[..., : h2 * 2, : w2 * 2]
    x = x.reshape(x.shape[:-2] + (h2, 2, w2, 2))
    return x.mean(axis=(-3, -1))


def build_pyramid(img: jnp.ndarray, n_levels: int) -> List[jnp.ndarray]:
    """List of n_levels images, level 0 = full resolution
    (reference: frame_utils::createImgPyramid, src/frame.cpp:171-180).
    One fused dispatch (jit over the whole chain)."""
    return list(_build_pyramid_jit(img, n_levels))


@partial(jax.jit, static_argnames=("n_levels",))
def _build_pyramid_jit(img, n_levels: int):
    pyr = [img.astype(jnp.float32)]
    for _ in range(1, n_levels):
        pyr.append(half_sample(pyr[-1]))
    return tuple(pyr)


class LazyPyr:
    """List-like view of ONE sequence's pyramid inside a batch-stacked
    pyramid (levels with a leading batch axis): slices `level[k]` lazily
    with caching, so per-sequence levels materialize only when actually
    read (keyframe installs) — never as per-frame eager device ops."""

    def __init__(self, stacked_levels, k: int):
        self._s = list(stacked_levels)
        self._k = k
        self._cache = {}

    def __len__(self):
        return len(self._s)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self._s)))]
        if i not in self._cache:
            self._cache[i] = self._s[i][self._k]
        return self._cache[i]

    def __iter__(self):
        return (self[i] for i in range(len(self)))


def pack_bilinear(img: jnp.ndarray) -> jnp.ndarray:
    """Pack the 4 bilinear taps of every pixel into the last axis:
    packed[v, u] = [I(v,u), I(v,u+1), I(v+1,u), I(v+1,u+1)].

    One gather of a contiguous 4-vector then replaces four scattered
    single-element gathers in bilinear_sample — measured 3.6x faster on
    TPU (XLA gather cost is per-row-segment, not per-element). The pack
    itself is three rolls + a stack, pure bandwidth (~7us for 752x480),
    and is CSE'd by XLA when a jitted program samples the same image
    repeatedly."""
    i01 = jnp.roll(img, -1, axis=-1)
    i10 = jnp.roll(img, -1, axis=-2)
    i11 = jnp.roll(i10, -1, axis=-1)
    return jnp.stack([img, i01, i10, i11], axis=-1)


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray, *, oob_value: float = 0.0):
    """Bilinear interpolation at subpixel coords (vk::interpolateMat_8u
    analogue, used e.g. at src/matcher.cpp:126).

    img: (H, W) image OR (H, W, 4) pre-packed taps (see pack_bilinear);
    uv: (..., 2) as (u=x, v=y). Returns (values, valid_mask) where valid
    marks samples whose full 2x2 support is inside the image.
    """
    if img.ndim == 2:
        packed = pack_bilinear(img)
    else:
        packed = img
    H, W = packed.shape[0], packed.shape[1]
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    valid = (u0i >= 0) & (v0i >= 0) & (u0i + 1 <= W - 1) & (v0i + 1 <= H - 1)
    u0c = jnp.clip(u0i, 0, W - 2)
    v0c = jnp.clip(v0i, 0, H - 2)
    taps = packed[v0c, u0c]  # (..., 4) one contiguous-vector gather
    w00 = (1.0 - fu) * (1.0 - fv)
    w01 = fu * (1.0 - fv)
    w10 = (1.0 - fu) * fv
    w11 = fu * fv
    val = (w00 * taps[..., 0] + w01 * taps[..., 1]
           + w10 * taps[..., 2] + w11 * taps[..., 3])
    return jnp.where(valid, val, oob_value), valid


def pack_bilinear_multi(channels) -> jnp.ndarray:
    """pack_bilinear for C channels at once: returns (H, W, 4, C) so ONE
    gather of a contiguous 4*C-float segment yields every channel's four
    bilinear taps (e.g. intensity + dense dx/dy gradient maps — a 5-gather
    patch+gradient sample becomes one gather)."""
    return jnp.stack([pack_bilinear(c) for c in channels], axis=-1)


def bilinear_sample_multi(packed: jnp.ndarray, uv: jnp.ndarray):
    """Bilinear interpolation of a (H, W, 4, C) multi-channel packed texture
    (see pack_bilinear_multi). Returns (values (..., C), valid).

    Central-difference-of-interpolant equals interpolant-of-central-
    difference (both are linear shift-invariant operators), so channel c
    holding a dense gradient map reproduces _patch_and_grad's subpixel
    gradients exactly — except at the 1px image border where the dense map
    is zeroed; `valid` therefore requires a 1px interior margin."""
    H, W = packed.shape[0], packed.shape[1]
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    # gradient maps are zeroed on the outermost ring -> require it interior
    valid = (u0i >= 1) & (v0i >= 1) & (u0i + 1 <= W - 2) & (v0i + 1 <= H - 2)
    u0c = jnp.clip(u0i, 0, W - 2)
    v0c = jnp.clip(v0i, 0, H - 2)
    taps = packed[v0c, u0c]  # (..., 4, C) one contiguous-segment gather
    w = jnp.stack([(1.0 - fu) * (1.0 - fv), fu * (1.0 - fv),
                   (1.0 - fu) * fv, fu * fv], axis=-1)  # (..., 4)
    val = jnp.einsum("...k,...kc->...c", w, taps)
    return jnp.where(valid[..., None], val, 0.0), valid


def patch_offsets(patch_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """(patch_size**2, 2) offsets centered on the patch: the reference uses
    top-left-anchored loops with halfpatch offset (src/sparse_img_align.cpp:224);
    here offsets run [-half, half) so a patch center is the feature position."""
    half = patch_size / 2.0
    r = jnp.arange(patch_size, dtype=dtype) - half + 0.5
    # offset of pixel centers relative to feature position, (x, y) order
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([ox.ravel(), oy.ravel()], axis=-1)


def extract_patches(img: jnp.ndarray, centers: jnp.ndarray, patch_size: int):
    """Gather (N, patch_size**2) patches at subpixel centers (N, 2).

    Returns (patches, valid) where valid is (N,) true iff every pixel of the
    patch had full bilinear support."""
    offs = patch_offsets(patch_size, centers.dtype)  # (P,2)
    coords = centers[..., None, :] + offs  # (..., P, 2)
    vals, ok = bilinear_sample(img, coords)
    return vals, jnp.all(ok, axis=-1)


def gradient(img: jnp.ndarray):
    """Central-difference gradients (dx, dy), each (H, W).

    Matches the 0.5*(I[x+1]-I[x-1]) stencil the reference uses for patch
    Jacobians (src/sparse_img_align.cpp:246-249)."""
    dx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    dy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    # zero out the wrap-around borders
    dx = dx.at[:, 0].set(0.0).at[:, -1].set(0.0)
    dy = dy.at[0, :].set(0.0).at[-1, :].set(0.0)
    return dx, dy


def shi_tomasi_score(img: jnp.ndarray, halfbox: int = 4) -> jnp.ndarray:
    """Dense Shi-Tomasi (min eigenvalue of structure tensor) response map.

    vk::shiTomasiScore analogue (used per-corner at
    src/feature_detection.cpp:91); computed densely here — one fused map
    beats per-corner gathers on TPU. Box window of (2*halfbox)^2 pixels,
    same normalization as vikit (score = min-eig / (2*N))."""
    dx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    dy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    dxx = dx * dx
    dyy = dy * dy
    dxy = dx * dy

    def box(x):
        k = 2 * halfbox
        # separable box sum via cumsum trick
        cs = jnp.cumsum(x, axis=0)
        cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
        xs = cs[k:, :] - cs[:-k, :]
        c = jnp.cumsum(xs, axis=1)
        c = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=1)
        out = c[:, k:] - c[:, :-k]
        # pad back to (H, W), centered
        ph0 = halfbox
        ph1 = x.shape[0] - out.shape[0] - ph0
        pw0 = halfbox
        pw1 = x.shape[1] - out.shape[1] - pw0
        return jnp.pad(out, ((ph0, ph1), (pw0, pw1)))

    sxx = box(dxx)
    syy = box(dyy)
    sxy = box(dxy)
    n = (2.0 * halfbox) ** 2
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr * 0.25 - det, 0.0))
    min_eig = 0.5 * tr - disc
    return min_eig / (2.0 * n)


# ---------------------------------------------------------------------------
# Pyramid atlas: all levels packed side-by-side into ONE image so that
# per-feature level-dependent sampling becomes a single gather pass (instead
# of evaluating every pyramid level and masking — the naive port of the
# reference's per-level branches). Levels are separated by a 2-column gap of
# zeros; sampling validity is enforced against the *level* bounds, so the
# gap never bleeds into bilinear taps.
# ---------------------------------------------------------------------------

_ATLAS_GAP = 2


def atlas_layout(shapes):
    """shapes: list of (h_l, w_l). Returns (x_offsets (L,), H, W_total)."""
    offs = []
    x = 0
    H = shapes[0][0]
    for (h, w) in shapes:
        offs.append(x)
        x += w + _ATLAS_GAP
    return offs, H, x


def pack_pyramid_atlas(pyr):
    """Pack a pyramid (list of (h_l,w_l) or (K,h_l,w_l) arrays) into one
    atlas of shape (..., H0, W_total). Returns (atlas, x_offsets, sizes)
    with x_offsets int32 (L,) and sizes int32 (L,2) as (h_l, w_l)."""
    shapes = [p.shape[-2:] for p in pyr]
    offs, H, Wt = atlas_layout(shapes)
    lead = pyr[0].shape[:-2]
    parts = []
    for p, (h, w) in zip(pyr, shapes):
        pad_h = H - h
        parts.append(jnp.pad(p, [(0, 0)] * len(lead) + [(0, pad_h), (0, _ATLAS_GAP)]))
    atlas = jnp.concatenate(parts, axis=-1)
    x_offsets = jnp.asarray(offs, jnp.int32)
    sizes = jnp.asarray(shapes, jnp.int32)
    return atlas, x_offsets, sizes


class FlatAtlas(NamedTuple):
    """Flattened multi-image pyramid atlas for per-feature-image gathers.

    flat: (H0, K*Wa) — the K per-image atlases laid side by side (image
    k's level-l pixel (u,v) lives at column k*Wa + x_off[l] + u). The
    construction (pad + concat + transpose) runs once per keyframe change
    (MapState cache), not inside every fused step. Deliberately NOT
    pre-packed into 4-tap form: the 4x-bigger packed texture, held
    persistently per sequence (and doubly while in-flight pipelined steps
    pin the pre-keyframe version), exhausts HBM in multi-stream serving —
    pack_bilinear stays a transient inside the consuming jit, where the
    allocator reuses one buffer across steps."""

    flat: jnp.ndarray  # (H0, K*Wa) f32
    x_off: jnp.ndarray  # (L,) int32 level column offsets within one image
    sizes: jnp.ndarray  # (L,2) int32 (h_l, w_l)
    width: jnp.ndarray  # () float32 Wa — per-image column stride


@jax.jit
def _pack_flat_jit(pyr_stack):
    atlas, x_off, sizes = pack_pyramid_atlas(pyr_stack)  # (K,H,Wa)
    K, H, Wa = atlas.shape
    flat = jnp.swapaxes(atlas, 0, 1).reshape(H, K * Wa)
    return flat, x_off, sizes


def pack_pyramid_atlas_flat(pyr_stack) -> FlatAtlas:
    """Pack a (K,h_l,w_l) level list into a FlatAtlas (one fused dispatch)."""
    flat, x_off, sizes = _pack_flat_jit(tuple(pyr_stack))
    Wa = flat.shape[1] // pyr_stack[0].shape[0]
    return FlatAtlas(flat=flat, x_off=x_off, sizes=sizes,
                     width=jnp.asarray(float(Wa), jnp.float32))


def ensure_flat_atlas(kf) -> FlatAtlas:
    """Accept either a FlatAtlas (cached by the caller) or a raw list of
    (K,h,w) pyramid level stacks (packed here, for tests/one-off calls)."""
    if isinstance(kf, FlatAtlas):
        return kf
    return pack_pyramid_atlas_flat(kf)


# ---------------------------------------------------------------------------
# Patch windows: prefetch a (wp x wp) pixel window per feature ONCE, then
# resample axis-aligned patches from the windows with pure elementwise math
# (one-hot slice selection) — NO per-iteration gather. Measured on v5e: a
# global 8x8 patch gather costs ~213 us per GN iteration at N=384; in-window
# resampling is below measurement noise. This is what makes the align2d /
# sparse-align while_loops cheap: the gather happens once, the 10-30
# iterations are free. The price is a bounded drift budget: once a feature
# moves further than the window margin from its prefetch center it stops
# being sampled (masked invalid) — equivalent to the reference's patches
# leaving the image, and rare at VO convergence scales.
# ---------------------------------------------------------------------------


def gather_windows_raw(img, corner_i, wp: int):
    """ONE slice-gather of (N, wp, wp) raw windows at integer corners.

    corner_i: (N,2) int32 (u,v), already clipped to [0, max(dim-wp, 0)];
    wp must be even. Two mechanisms, chosen by measured cost
    (scratch/bench_win_variants.py):
    - wp <= 16: wp^2/4 packed-tap 2x2 block gathers per window
      (contiguous 4-vectors, ~10 ns/block; the pack's 4x image
      materialization is CSE'd across all gathers on the same image in
      one program)
    - wp > 16: one vmapped dynamic_slice per window (~0.8 us/slice flat
      overhead — cheaper than wp^2/4 blocks once windows are large, and
      it never materializes a packed image)
    Images smaller than the window are zero-padded (callers' bounds masks
    reject the pad taps)."""
    H, W = img.shape
    if H < wp or W < wp:
        img = jnp.pad(img, ((0, max(wp - H, 0)), (0, max(wp - W, 0))))
        H, W = img.shape
    if H * W <= 32768 and wp <= 16:
        # small image (coarse pyramid levels): one-hot matmul extraction —
        # rows then columns ride the MXU and there is NO gather at all;
        # measured ~faster than the block gather by >10x at these sizes
        iu = corner_i[:, 0]
        iv = corner_i[:, 1]
        dd = jnp.arange(wp, dtype=jnp.int32)
        hh = jnp.arange(H, dtype=jnp.int32)
        ww = jnp.arange(W, dtype=jnp.int32)
        rsel = (hh[None, None, :] == (iv[:, None] + dd[None, :])[..., None]
                ).astype(img.dtype)  # (N, wp, H)
        bmat = jnp.einsum("nih,hw->niw", rsel, img,
                          preferred_element_type=jnp.float32)
        csel = (ww[None, :, None] == (iu[:, None] + dd[None, :])[:, None, :]
                ).astype(img.dtype)  # (N, W, wp)
        return jnp.einsum("niw,nwj->nij", bmat, csel,
                          preferred_element_type=jnp.float32)
    if wp > 16:
        def slice_one(c):
            return jax.lax.dynamic_slice(img, (c[1], c[0]), (wp, wp))

        return jax.vmap(slice_one)(corner_i)
    packed = pack_bilinear(img)  # (H, W, 4)
    nb = wp // 2
    bj = jnp.arange(nb, dtype=jnp.int32) * 2
    gu = corner_i[:, 0:1] + bj[None]  # (N,nb)
    gv = corner_i[:, 1:2] + bj[None]
    blocks = packed[gv[:, :, None], gu[:, None, :]]  # (N,nb,nb,4)
    N = blocks.shape[0]
    return (blocks.reshape(N, nb, nb, 2, 2)
            .transpose(0, 1, 3, 2, 4).reshape(N, wp, wp))


def gather_patch_windows(img, uv_center, wp: int):
    """Prefetch (N, wp, wp) raw-intensity windows centered at uv_center.

    img: (H, W) image. Returns (win, corner) with corner (N,2) float32
    absolute (u,v) of win[:,0,0]. One slice-gather of N contiguous windows
    (see gather_windows_raw). The corner is clamped into the image, so a
    window near the border SHIFTS instead of zero-padding; callers mask
    per-tap validity against the true image bounds (sample_patch_windows
    wh arg / in-window checks), which the shift never loosens."""
    H, W = img.shape
    corner = jnp.floor(uv_center - (wp / 2.0 - 1.0))  # (N,2) float (u,v)
    ci = corner.astype(jnp.int32)
    cu = jnp.clip(ci[:, 0], 0, max(W - wp, 0))
    cv = jnp.clip(ci[:, 1], 0, max(H - wp, 0))
    win = gather_windows_raw(img, jnp.stack([cu, cv], -1), wp)
    corner_eff = jnp.stack([cu, cv], -1).astype(uv_center.dtype)
    return win, corner_eff


def gather_patch_windows_atlas(atlas, x_offsets, uv_center, level, wp: int):
    """gather_patch_windows through a pyramid atlas: uv_center is in each
    feature's OWN level coords; the gather adds x_offsets[level]. corner is
    returned in level coords. Corners clamp to the FLAT atlas bounds (a
    window near a level edge reads into the inter-level gap — those taps
    are rejected by the caller's level-bounds mask, sample_patch_windows
    wh arg)."""
    H, Wt = atlas.shape[-2:]
    corner = jnp.floor(uv_center - (wp / 2.0 - 1.0))
    ci = corner.astype(jnp.int32)
    xo = x_offsets[level]
    cu_flat = jnp.clip(ci[:, 0] + xo, 0, max(Wt - wp, 0))
    cv = jnp.clip(ci[:, 1], 0, max(H - wp, 0))
    win = gather_windows_raw(atlas, jnp.stack([cu_flat, cv], -1), wp)
    corner_eff = jnp.stack([(cu_flat - xo), cv], -1).astype(uv_center.dtype)
    return win, corner_eff


def sample_in_window(win, corner, pos):
    """Bilinear-sample ARBITRARY per-tap positions from prefetched windows.

    win: (N, wp, wp) raw windows; corner: (N, 2) absolute (u, v) of
    win[:,0,0] (same frame as pos); pos: (N, T, 2) absolute tap positions
    (each tap its own fractional offset — unlike sample_patch_windows,
    which requires one shared offset per window). Returns (vals (N, T),
    ok (N, T)) with ok true iff the tap's full 2x2 support lies inside the
    window.

    Mechanism: soft one-hot row/column selection contracted on the MXU —
    ztop[n,t,j] = sum_v rowsel[n,t,v] * win[n,v,j], then a column
    contraction — zero gathers. The row/col selectors carry the bilinear
    lerp weights ((1-f) at floor, f at floor+1), so the contraction IS the
    bilinear interpolation."""
    N, wp, _ = win.shape
    f32 = jnp.float32
    local = pos - corner[:, None, :]  # (N,T,2) window-local
    lu = local[..., 0]
    lv = local[..., 1]
    iu = jnp.floor(lu)
    iv = jnp.floor(lv)
    fu = (lu - iu).astype(f32)
    fv = (lv - iv).astype(f32)
    ok = (iu >= 0) & (iv >= 0) & (iu <= wp - 2) & (iv <= wp - 2)
    iuc = jnp.clip(iu, 0, wp - 2)
    ivc = jnp.clip(iv, 0, wp - 2)
    grid = jnp.arange(wp, dtype=f32)
    # soft one-hot: weight (1-f) at floor, f at floor+1
    rsel = (jnp.where(grid == ivc[..., None], 1.0 - fv[..., None], 0.0)
            + jnp.where(grid == ivc[..., None] + 1.0, fv[..., None], 0.0))
    csel = (jnp.where(grid == iuc[..., None], 1.0 - fu[..., None], 0.0)
            + jnp.where(grid == iuc[..., None] + 1.0, fu[..., None], 0.0))
    ztop = jnp.einsum("ntv,nvj->ntj", rsel, win.astype(f32),
                      preferred_element_type=f32)  # (N,T,wp)
    vals = jnp.einsum("ntj,ntj->nt", ztop, csel)
    return jnp.where(ok, vals, 0.0), ok


def sample_patch_windows(win, corner, uv, patch_size: int, wh=None):
    """Bilinear (patch_size x patch_size) patches from prefetched windows.

    win: (N, wp, wp); corner: (N,2) from gather_patch_windows*; uv: (N,2)
    subpixel centers in the SAME coordinate frame as the prefetch centers.
    wh: optional (w, h) per-feature image/level bounds, each (N,) — when
    given, validity also requires full bilinear support inside [0,w)x[0,h).
    Returns (vals (N, P*P) in patch_offsets order, ok (N,)).

    All patch taps share one fractional offset, so the resample is a
    separable one-hot slice selection + lerp: zero gathers, pure VPU."""
    N, wp, _ = win.shape
    P = patch_size
    S = wp - P
    f32 = jnp.float32
    first = uv - (P / 2.0 - 0.5)  # absolute position of tap (0,0)
    t0 = first - corner
    i0 = jnp.floor(t0)
    f = (t0 - i0).astype(f32)
    iu = i0[:, 0]
    iv = i0[:, 1]
    in_win = (iu >= 0) & (iv >= 0) & (iu <= S - 1) & (iv <= S - 1)
    iuc = jnp.clip(iu, 0, S - 1)
    ivc = jnp.clip(iv, 0, S - 1)
    shifts = jnp.arange(S, dtype=f32)
    oh_v = (shifts[:, None] == ivc[None, :]).astype(f32)  # (S,N)
    cand_v = jnp.stack([win[:, s:s + P + 1, :] for s in range(S)])  # (S,N,P+1,wp)
    sel_v = jnp.sum(oh_v[:, :, None, None] * cand_v, axis=0)  # (N,P+1,wp)
    fv = f[:, 1][:, None, None]
    rows = (1 - fv) * sel_v[:, :P, :] + fv * sel_v[:, 1:, :]  # (N,P,wp)
    cand_u = jnp.stack([rows[:, :, s:s + P + 1] for s in range(S)])
    oh_u = (shifts[:, None] == iuc[None, :]).astype(f32)
    sel_u = jnp.sum(oh_u[:, :, None, None] * cand_u, axis=0)  # (N,P,P+1)
    fu = f[:, 0][:, None, None]
    patch = (1 - fu) * sel_u[:, :, :P] + fu * sel_u[:, :, 1:]  # (N,P,P) [v,u]
    ok = in_win
    if wh is not None:
        w, h = wh
        au0 = jnp.floor(first[:, 0])
        av0 = jnp.floor(first[:, 1])
        ok = ok & (au0 >= 0) & (av0 >= 0) \
            & (au0 + P <= w - 1) & (av0 + P <= h - 1)
    return patch.reshape(N, P * P), ok


def bilinear_sample_atlas(atlas, x_offsets, sizes, uv_level, level):
    """Sample level-`level` coords through the atlas.

    atlas: (H, Wt); uv_level: (..., 2) coords in that level's pixel frame;
    level: (...,) int32 broadcastable against uv_level[..., 0].
    Returns (values, valid) with validity against the level bounds."""
    h = sizes[level, 0].astype(uv_level.dtype)
    w = sizes[level, 1].astype(uv_level.dtype)
    u = uv_level[..., 0]
    v = uv_level[..., 1]
    valid = (u >= 0) & (v >= 0) & (u <= w - 1) & (v <= h - 1)
    ua = u + x_offsets[level].astype(uv_level.dtype)
    vals, ok = bilinear_sample(atlas, jnp.stack([ua, v], axis=-1))
    return jnp.where(valid, vals, 0.0), valid & ok
