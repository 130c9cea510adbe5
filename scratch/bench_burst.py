"""Burst-K vs per-frame pipelined, end-to-end on the TPU."""
import dataclasses
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

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
imgs_u8 = [np.clip(np.round(im), 0, 255).astype(np.uint8) for im in imgs]

def run(cfg, name):
    for p in range(2):
        vo = FrameHandlerMono(cam, cfg)
        ts = []
        for i, im in enumerate(imgs_u8):
            t0 = time.perf_counter()
            vo.add_image(im, i / 30.0)
            ts.append(time.perf_counter() - t0)
        vo.flush()
        n_def = sum(1 for r in vo.results if r.stage == "default")
        steady = ts[len(ts) // 2:]
        print(f"pass{p} {name}: mean {np.mean(steady)*1e3:.1f} ms/frame "
              f"({1/np.mean(steady):.1f} fps) defaults={n_def} "
              f"relocs={vo.n_relocalizations}", flush=True)


import jax.numpy as jnp
mode = sys.argv[2] if len(sys.argv) > 2 else "u8"
if mode == "dev":
    staged = jnp.asarray(imgs.astype(np.float32))
    staged.block_until_ready()
    imgs_u8 = [staged[i] for i in range(len(imgs))]
run(Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=12)),
    f"pipelined d12 ({mode})")
run(Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=12,
                                   burst_k=K)), f"burst K={K} ({mode})")
