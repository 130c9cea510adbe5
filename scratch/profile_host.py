"""Where does single-seq pipelined wall time go per frame? cProfile +
phase timers around the handler's own permon buckets."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config, PipelineConfig
from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
imgs_u8 = [np.clip(np.round(im), 0, 255).astype(np.uint8) for im in imgs]

cfg = Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=12))

# pass 0: warm compiles
vo = FrameHandlerMono(cam, cfg)
for i, im in enumerate(imgs_u8):
    vo.add_image(im, i / 30.0)
vo.flush()

# pass 1: timed with phase breakdown
vo = FrameHandlerMono(cam, cfg)
rec = []
for i, im in enumerate(imgs_u8):
    t0 = time.perf_counter()
    vo.add_image(im, i / 30.0)
    dt = time.perf_counter() - t0
    tm = dict(vo.permon.timers)
    rec.append((dt, tm.get("pyramid_creation", 0.0),
                tm.get("sparse_img_align", 0.0),  # dispatch phase
                tm.get("reproject", 0.0)))  # burst fetch phase
rec = rec[len(rec) // 2:]
tot, pyr, disp, fetch = (np.mean([r[k] for r in rec]) * 1e3
                         for k in range(4))
print(f"frames {len(rec)}  total {tot:.1f}ms  pyramid(+upload) {pyr:.1f}  "
      f"dispatch {disp:.1f}  burst-fetch {fetch:.1f}  "
      f"other(host bookkeep) {tot-pyr-disp-fetch:.1f}")

# upload cost alone
im = imgs_u8[0]
for _ in range(3):
    x = jnp.asarray(im)
    x.block_until_ready()
t0 = time.perf_counter()
N = 20
for _ in range(N):
    x = jnp.asarray(im)
    x.block_until_ready()
print(f"uint8 360KB upload+block: {(time.perf_counter()-t0)/N*1e3:.2f} ms")

import cProfile
import pstats

vo = FrameHandlerMono(cam, cfg)
pr = cProfile.Profile()
pr.enable()
for i, im in enumerate(imgs_u8):
    vo.add_image(im, i / 30.0)
vo.flush()
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(28)
