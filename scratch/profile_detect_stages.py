"""Break down the keyframe detection program on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config
from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono
from plsvo_tpu.image import build_pyramid
from plsvo_tpu.ops import detection, lines as line_ops

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = jnp.asarray(np.load("/root/repo/.bench_frames.npz")["imgs"])[:3]
cfg = Config()
vo = FrameHandlerMono(cam, cfg)
pl = cfg.pipeline
pyr = tuple(build_pyramid(imgs[0], vo.n_levels))

def perturb(t, e):
    return jax.tree.map(lambda a: a + e if (hasattr(a, 'dtype') and jnp.issubdtype(a.dtype, jnp.floating)) else a, t)

def scanify(fn, iters):
    @jax.jit
    def run():
        def body(c, _):
            out = fn(c)
            s = sum(jnp.sum(l) for l in jax.tree.leaves(out)
                    if hasattr(l, 'dtype') and jnp.issubdtype(l.dtype, jnp.floating))
            return c + s * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c
    return run

def slope(fn, n=3):
    a, b = scanify(fn, 8), scanify(fn, 40)
    jax.block_until_ready(a()); jax.block_until_ready(b())
    t0 = time.perf_counter()
    for _ in range(n): jax.block_until_ready(a())
    ta = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n): jax.block_until_ready(b())
    tb = (time.perf_counter() - t0) / n
    return (tb - ta) / 32 * 1e3

min_len = pl.lsd_min_length * (W * H) / (W + H)

def d_full(e):
    return vo._detect_features(perturb(pyr, e))

def d_fast(e):
    return detection.detect_fast_grid(perturb(pyr[:pl.n_pyr_levels], e), cell_size=pl.grid_size, score_threshold=pl.triang_min_corner_score)

def d_edge(e):
    return detection.detect_edgelets_grid(pyr[0] + e, cell_size=pl.grid_size, mag_threshold=pl.edgelet_grad_thresh)

def d_tiled(e):
    return line_ops.detect_segments_tiled(pyr[0] + e, n_peaks=64, run_gap_px=3.0, dist_tol=1.2)

def d_global(e):
    return line_ops.detect_segments(pyr[0] + e, n_peaks=64, run_gap_px=3.0, dist_tol=1.2)

def d_dedup(e):
    det = line_ops.detect_segments_tiled(pyr[0] + e, n_peaks=64, run_gap_px=3.0, dist_tol=1.2)
    segs, _ = line_ops.dedup_segments_grid(det, width=W, height=H, cell_size=pl.grid_size_segs, max_segs=cfg.caps.max_segs, min_length=min_len)
    return segs

for name, fn in [("detect_features FULL", d_full), ("fast_grid", d_fast),
                 ("edgelets", d_edge), ("lines global only", d_global),
                 ("lines tiled (glob+tiles)", d_tiled),
                 ("tiled + dedup", d_dedup)]:
    print(f"{name:26s}: {slope(fn):7.2f} ms", flush=True)
