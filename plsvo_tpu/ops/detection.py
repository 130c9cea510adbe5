"""Grid-bucketed FAST-10 corner detection, fully vectorized.

TPU-native rebuild of the reference detector stack
(reference: src/feature_detection.cpp:53-104 — libfast FAST-10 +
vk::shiTomasiScore + fast_nonmax_3x3 + best-corner-per-grid-cell):

- FAST-10 is computed densely for the whole level with 16 `roll`-shifted
  images and boolean ring logic (VPU-friendly; no per-pixel branching).
- The ranking score is the dense Shi-Tomasi response (the reference ranks
  candidate corners per cell by Shi-Tomasi, feature_detection.cpp:88-99).
- 3x3 non-max suppression on the masked score map.
- Grid bucketing = segment-max over cell ids: every pyramid level competes
  in the same level-0 grid, best corner per cell wins
  (feature_detection.cpp:92-99).

Output is a fixed-capacity per-cell table (SURVEY §7.0 SoA design) —
no dynamic feature lists.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

# FAST ring of radius 3, circular order (same ring as libfast's FAST-10).
_FAST_RING = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


class CornerGrid(NamedTuple):
    """Per-grid-cell winning corner. All arrays have leading dim n_cells."""

    uv: jnp.ndarray  # (C, 2) float32, level-0 pixel coords
    level: jnp.ndarray  # (C,) int32 pyramid level of detection
    score: jnp.ndarray  # (C,) float32 Shi-Tomasi score
    valid: jnp.ndarray  # (C,) bool


@jax.jit
def fast_corner_mask(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-10 corner mask (H, W) bool.

    A pixel is a corner if >=10 contiguous ring pixels are all brighter
    than center+threshold or all darker than center-threshold
    (reference semantics: fast::fast_corner_detect_10,
    src/feature_detection.cpp:63-82)."""
    ring = [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dx, dy in _FAST_RING]
    ring = jnp.stack(ring, axis=0)  # (16, H, W)
    bright = ring > img[None] + threshold
    dark = ring < img[None] - threshold

    def has_run10(m):
        acc = jnp.zeros_like(m[0])
        for i in range(16):
            run = m[i]
            for k in range(1, 10):
                run = run & m[(i + k) % 16]
            acc = acc | run
        return acc

    corner = has_run10(bright) | has_run10(dark)
    # invalidate the 3-pixel border where the ring wraps around
    H, W = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inner = (yy >= 3) & (yy < H - 3) & (xx >= 3) & (xx < W - 3)
    return corner & inner


def _nonmax_3x3(score: jnp.ndarray) -> jnp.ndarray:
    """True where score is the strict max of its 3x3 neighbourhood
    (fast::fast_nonmax_3x3 analogue)."""
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            neigh.append(jnp.roll(score, (-dy, -dx), axis=(0, 1)))
    nmax = jnp.max(jnp.stack(neigh, axis=0), axis=0)
    return score >= nmax


def grid_cells(width: int, height: int, cell_size: int):
    nx = -(-width // cell_size)
    ny = -(-height // cell_size)
    return nx, ny, nx * ny


@partial(jax.jit, static_argnames=("cell_size",))
def detect_fast_grid(
    pyramid: Sequence[jnp.ndarray],
    *,
    cell_size: int = 25,
    fast_threshold: float = 10.0,
    score_threshold: float = 20.0,
    occupied: jnp.ndarray | None = None,
) -> CornerGrid:
    """Detect the best corner per grid cell across all pyramid levels.

    occupied: optional (C,) bool — cells already holding a feature are
    skipped (reference: setGridOccpuancy before detect,
    src/feature_detection.cpp:238-252 / depth_filter.cpp:151-197)."""
    H, W = pyramid[0].shape
    nx, ny, n_cells = grid_cells(W, H, cell_size)

    from plsvo_tpu.ops.pallas_fast import fast_score

    # Scatter-free per-level candidate extraction: a dense segment_max over
    # h*w pixels costs milliseconds on TPU (scatter unit); instead reduce
    # per HALF-CELL TILE with pure reshapes (max + winner-index min), then
    # run the tiny cross-level per-cell dedup over the ~4*n_cells tile
    # winners. Half-cell tiles keep the loss mode rare (a corner is only
    # shadowed when a stronger one shares its half-tile but belongs to a
    # neighbouring cell).
    cand_u, cand_v, cand_s, cand_l = [], [], [], []
    for level, img in enumerate(pyramid):
        h, w = img.shape
        scale = float(1 << level)
        # fused Pallas stencil on TPU (57x the rolled-XLA path), XLA fallback
        corner, score = fast_score(img, fast_threshold)
        masked = jnp.where(corner, score, -jnp.inf)
        keep = _nonmax_3x3(masked) & corner & (score > score_threshold)
        s = jnp.where(keep, score, -jnp.inf)

        T = max(2, int(round(cell_size / (1 << level) / 4)))
        hy = -(-h // T)
        wx = -(-w // T)
        sp = jnp.pad(s, ((0, hy * T - h), (0, wx * T - w)),
                     constant_values=-jnp.inf)
        tiles = sp.reshape(hy, T, wx, T)
        tmax = tiles.max(axis=(1, 3))  # (hy, wx)
        idx = jax.lax.broadcasted_iota(jnp.int32, (hy * T, wx * T), 0) \
            * (wx * T) \
            + jax.lax.broadcasted_iota(jnp.int32, (hy * T, wx * T), 1)
        idx_t = idx.reshape(hy, T, wx, T)
        is_w = tiles == tmax[:, None, :, None]
        widx = jnp.where(is_w & jnp.isfinite(tiles), idx_t,
                         jnp.iinfo(jnp.int32).max).min(axis=(1, 3))
        has = jnp.isfinite(tmax)
        wi = jnp.where(has, widx, 0)
        u0 = (wi % (wx * T)).astype(jnp.float32) * scale
        v0 = (wi // (wx * T)).astype(jnp.float32) * scale
        cand_u.append(u0.ravel())
        cand_v.append(v0.ravel())
        cand_s.append(jnp.where(has, tmax, -jnp.inf).ravel())
        cand_l.append(jnp.full(hy * wx, level, jnp.int32))

    cu = jnp.concatenate(cand_u)
    cv = jnp.concatenate(cand_v)
    cs = jnp.concatenate(cand_s)
    cl = jnp.concatenate(cand_l)
    cell = (jnp.clip((cv / cell_size).astype(jnp.int32), 0, ny - 1) * nx
            + jnp.clip((cu / cell_size).astype(jnp.int32), 0, nx - 1))
    cell_max = jax.ops.segment_max(cs, cell, num_segments=n_cells)
    ci = jnp.arange(cu.shape[0], dtype=jnp.int32)
    is_winner = (cs == cell_max[cell]) & jnp.isfinite(cs)
    win = jax.ops.segment_min(
        jnp.where(is_winner, ci, jnp.iinfo(jnp.int32).max), cell,
        num_segments=n_cells)
    has_c = win < jnp.iinfo(jnp.int32).max
    wc = jnp.where(has_c, win, 0)
    best_u = cu[wc]
    best_v = cv[wc]
    best_level = cl[wc]
    best_score = jnp.where(has_c, cell_max, -jnp.inf)

    valid = jnp.isfinite(best_score) & (best_score > score_threshold)
    if occupied is not None:
        valid = valid & ~occupied
    return CornerGrid(
        uv=jnp.stack([best_u, best_v], axis=-1),
        level=best_level,
        score=jnp.where(valid, best_score, 0.0),
        valid=valid,
    )


class EdgeletGrid(NamedTuple):
    """Per-grid-cell winning edgelet: the strongest-gradient pixel of each
    cell with its dominant gradient direction (normal to the edge)."""

    uv: jnp.ndarray  # (C, 2) float32, level-0 pixel coords
    level: jnp.ndarray  # (C,) int32 (always 0 for now)
    grad_dir: jnp.ndarray  # (C, 2) float32 unit gradient direction
    mag: jnp.ndarray  # (C,) float32 gradient magnitude
    valid: jnp.ndarray  # (C,) bool


@partial(jax.jit, static_argnames=("cell_size",))
def detect_edgelets_grid(
    img: jnp.ndarray,
    *,
    cell_size: int = 25,
    mag_threshold: float = 30.0,
) -> EdgeletGrid:
    """Best edgelet per grid cell: the max-|∇I| pixel, with the normalized
    gradient as the feature's dominant direction.

    The reference defines the EDGELET feature class with a dominant
    gradient direction (feature.h:54-73) and routes it through align1D in
    the matcher (matcher.cpp:191-207) — but its own FastDetector never
    CREATES edgelets, so the class is dead on arrival there. This detector
    populates it (the SVO-2 style gradient-cell detector): cells that FAST
    leaves empty get an edge feature when the texture is 1-D. Pure
    reshape/reduce — no scatters."""
    H, W = img.shape
    nx, ny, n_cells = grid_cells(W, H, cell_size)
    from plsvo_tpu.image import gradient

    dx, dy = gradient(img)
    mag = dx * dx + dy * dy
    # kill the border (no central difference support / patch room)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inner = (yy >= 4) & (yy < H - 4) & (xx >= 4) & (xx < W - 4)
    # reject candidates whose matching patch touches INVALID (≈0) pixels:
    # the content/void boundary (undistortion borders, synthetic scene
    # edges) is the strongest gradient in the image and is view-dependent —
    # an edgelet there can never be matched. Separable 9x9 min filter.
    vmin = img
    for ax in (0, 1):
        m1 = vmin
        for s in range(1, 5):
            m1 = jnp.minimum(m1, jnp.roll(vmin, s, axis=ax))
            m1 = jnp.minimum(m1, jnp.roll(vmin, -s, axis=ax))
        vmin = m1
    inner = inner & (vmin > 0.5)
    m = jnp.where(inner, mag, -jnp.inf)

    T = cell_size
    mp = jnp.pad(m, ((0, ny * T - H), (0, nx * T - W)),
                 constant_values=-jnp.inf)
    tiles = mp.reshape(ny, T, nx, T)
    tmax = tiles.max(axis=(1, 3))  # (ny, nx)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (ny * T, nx * T), 0)
           * (nx * T)
           + jax.lax.broadcasted_iota(jnp.int32, (ny * T, nx * T), 1))
    idx_t = idx.reshape(ny, T, nx, T)
    is_w = (tiles == tmax[:, None, :, None]) & jnp.isfinite(tiles)
    widx = jnp.where(is_w, idx_t, jnp.iinfo(jnp.int32).max).min(axis=(1, 3))
    has = jnp.isfinite(tmax) & (tmax > mag_threshold * mag_threshold)
    wi = jnp.where(has, widx, 0).ravel()
    u = (wi % (nx * T)).astype(jnp.float32)
    v = (wi // (nx * T)).astype(jnp.float32)
    vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
    ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
    g = jnp.stack([dx[vi, ui], dy[vi, ui]], -1)
    g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8)
    return EdgeletGrid(
        uv=jnp.stack([u, v], -1), level=jnp.zeros(n_cells, jnp.int32),
        grad_dir=g, mag=jnp.sqrt(jnp.maximum(tmax.ravel(), 0.0)),
        valid=has.ravel())


@partial(jax.jit, static_argnames=("width", "height", "cell_size"))
def occupancy_from_positions(
    uv: jnp.ndarray, valid: jnp.ndarray, width: int, height: int, cell_size: int
) -> jnp.ndarray:
    """Mark grid cells containing existing features (level-0 coords)."""
    nx, ny, n_cells = grid_cells(width, height, cell_size)
    cell = (
        jnp.clip((uv[..., 1] / cell_size).astype(jnp.int32), 0, ny - 1) * nx
        + jnp.clip((uv[..., 0] / cell_size).astype(jnp.int32), 0, nx - 1)
    )
    occ = jnp.zeros((n_cells,), bool)
    return occ.at[jnp.where(valid, cell, 0)].max(valid)
