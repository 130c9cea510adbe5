"""True device throughput of the full pipelined per-frame program chain:
dispatch everything with a huge depth (no mid-run drains), then flush once.
Wall of dispatch loop vs wall of final flush tells who is the bottleneck."""
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
staged = jnp.asarray(imgs.astype(np.float32))
staged.block_until_ready()
imgs_dev = [staged[i] for i in range(len(imgs))]

for depth in (64, 12):
    cfg = Config(pipeline=PipelineConfig(pipelined=True,
                                         pipeline_depth=depth))
    for p in range(2):
        vo = FrameHandlerMono(cam, cfg)
        t0 = time.perf_counter()
        for i, im in enumerate(imgs_dev):
            vo.add_image(im, i / 30.0)
        t_disp = time.perf_counter() - t0
        t1 = time.perf_counter()
        vo.flush()
        t_flush = time.perf_counter() - t1
        n = len(imgs_dev)
        print(f"depth={depth} pass{p}: dispatch {t_disp/n*1e3:.1f} ms/f, "
              f"flush {t_flush:.2f} s, total {(t_disp+t_flush)/n*1e3:.1f} "
              f"ms/f ({n/(t_disp+t_flush):.1f} fps)", flush=True)
