"""Tuning sweep over execution knobs that do NOT create new program
variants: pipeline_depth, upload dtype, stream count. Steady-state fps for
single-seq and streams mode."""
import sys
import time

import numpy as np


def run_single(imgs_dev, cam, depth):
    import numpy as np
    from plsvo_tpu.config import Config, PipelineConfig
    from plsvo_tpu.pipeline.frame_handler import (STAGE_DEFAULT,
                                                  FrameHandlerMono)

    cfg = Config(pipeline=PipelineConfig(pipelined=True,
                                         pipeline_depth=depth))
    vo = FrameHandlerMono(cam, cfg)
    times = []
    for i, img in enumerate(imgs_dev):
        t0 = time.perf_counter()
        r = vo.add_image(img, i / 30.0)
        times.append((r.stage if r is not None else STAGE_DEFAULT,
                      time.perf_counter() - t0))
    vo.flush()
    dts = [dt for s, dt in times if s == STAGE_DEFAULT]
    steady = dts[len(dts) // 2:]
    fps = 1.0 / float(np.mean(steady))
    print(f"single depth={depth}: {fps:.2f} fps", flush=True)
    return fps


def run_streams(imgs_h, cam, depth, B):
    from plsvo_tpu.config import Config, PipelineConfig
    from plsvo_tpu.parallel.multi_vo import BatchedVO

    n = len(imgs_h)
    bvo = BatchedVO(cam, Config(pipeline=PipelineConfig(
        pipelined=True, pipeline_depth=depth)), B, mode="streams")
    bt = []
    for i in range(n):
        t0 = time.perf_counter()
        bvo.add_images([imgs_h[max(0, i - k) % n] for k in range(B)],
                       i / 30.0)
        bt.append((time.perf_counter() - t0,
                   all(s == "default" for s in bvo.stages)))
    bvo.flush()
    defaults = [dt for dt, ok in bt if ok]
    steady = defaults[len(defaults) // 2:]
    agg = B / float(np.mean(steady))
    print(f"streams B={B} depth={depth} "
          f"dtype={np.asarray(imgs_h[0]).dtype}: {agg:.2f} agg fps",
          flush=True)
    return agg


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from plsvo_tpu.camera import PinholeCamera

    W, H = 752, 480
    cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
    imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
    imgs_dev = jnp.asarray(imgs)
    imgs_f32 = [np.asarray(im) for im in imgs]
    imgs_u8 = [np.clip(np.round(im), 0, 255).astype(np.uint8)
               for im in imgs_f32]

    run_single(imgs_dev, cam, 4)   # baseline (warm everything)
    run_single(imgs_dev, cam, 8)
    run_single(imgs_dev, cam, 12)
    run_streams(imgs_f32, cam, 4, 8)
    run_streams(imgs_u8, cam, 4, 8)
    run_streams(imgs_u8, cam, 8, 8)
    run_streams(imgs_u8, cam, 8, 16)


if __name__ == "__main__":
    main()
