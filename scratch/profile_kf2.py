"""Device time of the keyframe path pieces: FAST grid, Hough segments,
occupancy, seed scatters."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config
from plsvo_tpu.image import build_pyramid
from plsvo_tpu.ops import detection, lines as line_ops

W, H = 752, 480
cfg = Config()
pl_ = cfg.pipeline
imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
pyr = build_pyramid(jnp.asarray(imgs[20]), 5)
jax.block_until_ready(pyr)


def t(label, fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs[-1])
    print(f"{label:40s}: {(time.perf_counter()-t0)/n*1000:7.2f} ms")


t("detect_fast_grid (3 lvl)", lambda: detection.detect_fast_grid(
    pyr[: pl_.n_pyr_levels], cell_size=pl_.grid_size,
    score_threshold=pl_.triang_min_corner_score))
t("detect_segments (lvl1)", lambda: line_ops.detect_segments(pyr[1], n_peaks=64))


def seg_full():
    det = line_ops.detect_segments(pyr[1], n_peaks=64)
    det = det._replace(sp=det.sp * 2.0, ep=det.ep * 2.0, length=det.length * 2.0)
    return line_ops.dedup_segments_grid(
        det, width=W, height=H, cell_size=pl_.grid_size_segs,
        max_segs=cfg.caps.max_segs, min_length=pl_.lsd_min_length * min(W, H))


t("detect_segments + dedup", seg_full)

occ_uv = jnp.asarray(np.random.uniform(0, 400, (384, 2)).astype(np.float32))
occ_ok = jnp.ones(384, bool)
t("occupancy_from_positions", lambda: detection.occupancy_from_positions(
    occ_uv, occ_ok, W, H, pl_.grid_size))
t("build_pyramid", lambda: build_pyramid(jnp.asarray(imgs[21]), 5))
