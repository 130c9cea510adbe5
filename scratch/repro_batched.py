"""Reproduce the batched-8 streams-mode throughput collapse (VERDICT weak #1).

Mimics bench.py's batched phase exactly, but instruments per-stream
add_image time so we can see WHERE the 185->1120ms growth comes from.
"""
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from plsvo_tpu.camera import PinholeCamera
    from plsvo_tpu.config import Config, PipelineConfig
    from plsvo_tpu.parallel.multi_vo import BatchedVO

    W, H = 752, 480
    cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
    imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
    n_frames = imgs.shape[0]
    imgs_h = [np.clip(np.round(im), 0, 255).astype(np.uint8) for im in imgs]

    B = int(os.environ.get("BENCH_BATCH", "8"))
    n_pass = int(os.environ.get("N_PASS", "1"))
    for _pass in range(n_pass):
        bvo = BatchedVO(cam, Config(pipeline=PipelineConfig(
            pipelined=True, pipeline_depth=8)), B, mode="streams")
        for i in range(n_frames):
            t0 = time.perf_counter()
            per_vo = []
            for k, vo in enumerate(bvo.vos):
                tv = time.perf_counter()
                vo.add_image(imgs_h[max(0, i - k)], i / 30.0)
                per_vo.append(time.perf_counter() - tv)
            dt = time.perf_counter() - t0
            nkfs = [vo.map.n_keyframes() for vo in bvo.vos]
            nlms = [int((vo.map.pt_status > 0).sum()) for vo in bvo.vos]
            seeds = [int(vo._seed_alive.sum()) for vo in bvo.vos]
            worst = int(np.argmax(per_vo))
            print(f"f{i:3d} {dt*1000:7.1f}ms worst=vo{worst}"
                  f"({per_vo[worst]*1000:6.1f}ms) "
                  f"pervo={' '.join(f'{t*1000:5.0f}' for t in per_vo)} "
                  f"kfs={nkfs} lms={max(nlms)} seeds={max(seeds)}",
                  file=sys.stderr, flush=True)
        bvo.flush()


if __name__ == "__main__":
    main()
