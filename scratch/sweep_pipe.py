"""Sweep pipelined ingest mode (u8 upload vs device-resident) and depth."""
import sys
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
imgs_f = np.load("/root/repo/.bench_frames.npz")["imgs"]
imgs_u8 = [np.clip(np.round(im), 0, 255).astype(np.uint8) for im in imgs_f]
staged = jnp.asarray(imgs_f.astype(np.float32))
staged.block_until_ready()
imgs_dev = [staged[i] for i in range(len(imgs_f))]


def run(cfg, frames, name, passes=2):
    best = 0.0
    for p in range(passes):
        vo = FrameHandlerMono(cam, cfg)
        ts = []
        for i, im in enumerate(frames):
            t0 = time.perf_counter()
            vo.add_image(im, i / 30.0)
            ts.append(time.perf_counter() - t0)
        vo.flush()
        steady = ts[len(ts) // 2:]
        fps = 1 / np.mean(steady)
        best = max(best, fps)
        print(f"pass{p} {name}: {np.mean(steady)*1e3:.1f} ms/frame "
              f"({fps:.1f} fps) relocs={vo.n_relocalizations}", flush=True)
    return best


for depth in (12, 24):
    run(Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=depth)),
        imgs_u8, f"u8 d{depth}")
run(Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=12)),
    imgs_dev, "dev d12")
