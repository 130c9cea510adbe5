"""Profile the keyframe-path ops: detection (FAST + Hough), occupancy."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.config import Config
from plsvo_tpu.image import build_pyramid
from plsvo_tpu.ops import detection, lines as line_ops

cfg = Config()
pl_ = cfg.pipeline
W, H = 752, 480
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
pyr = build_pyramid(img, 5)
jax.block_until_ready(pyr)


def t(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(jax.device_get(out))
    return (time.perf_counter() - t0) / n * 1000


ms = t(detection.detect_fast_grid, pyr[: pl_.n_pyr_levels],
       cell_size=pl_.grid_size, score_threshold=pl_.triang_min_corner_score)
print(f"detect_fast_grid     : {ms:7.1f} ms", flush=True)

ms = t(line_ops.detect_segments, pyr[1], n_peaks=64)
print(f"detect_segments(Hough): {ms:7.1f} ms", flush=True)

det = line_ops.detect_segments(pyr[1], n_peaks=64)
det = det._replace(sp=det.sp * 2.0, ep=det.ep * 2.0, length=det.length * 2.0)
ms = t(line_ops.dedup_segments_grid, det, width=W, height=H,
       cell_size=pl_.grid_size_segs, max_segs=cfg.caps.max_segs,
       min_length=pl_.lsd_min_length * min(W, H))
print(f"dedup_segments_grid  : {ms:7.1f} ms", flush=True)

occ = detection.occupancy_from_positions(
    jnp.asarray(rng.uniform(20, 400, (200, 2)).astype(np.float32)),
    jnp.ones(200, bool), W, H, pl_.grid_size)
ms = t(detection.occupancy_from_positions,
       jnp.asarray(rng.uniform(20, 400, (200, 2)).astype(np.float32)),
       jnp.ones(200, bool), W, H, pl_.grid_size)
print(f"occupancy_from_pos   : {ms:7.1f} ms", flush=True)
