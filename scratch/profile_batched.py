"""Profile the pipelined batched VO: where do the burst seconds go?

Times, at steady state (warm cache):
  (a) device time of ONE chained batched step (dispatch -> fetch small leaf)
  (b) the same for a single-seq chained step
  (c) one KF seed-detection program (FAST+Hough+occupancy)
  (d) fetch latency of a full burst payload that is already computed
Writes everything to stdout (run redirected to a file).
"""
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
    from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono

    W, H = 752, 480
    cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
    imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
    n = imgs.shape[0]
    B = 8
    imgs_h = [np.asarray(im) for im in imgs]

    cfg = Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=4))
    bvo = BatchedVO(cam, cfg, B)
    print("warming up batched vo...", flush=True)
    for i in range(40):
        t0 = time.perf_counter()
        bvo.add_images([imgs_h[max(0, i - k)] for k in range(B)], i / 30.0)
        print(f"frame {i}: {(time.perf_counter()-t0)*1000:.1f}ms "
              f"stages={set(bvo.stages)}", flush=True)

    # --- (a) one chained batched step: dispatch then fetch a small leaf
    # (everything in the chain up to it must finish => device time)
    bvo.flush()
    for i in range(40, 44):
        t0 = time.perf_counter()
        bvo.add_images([imgs_h[max(0, i - k)] for k in range(B)], i / 30.0)
        t_disp = time.perf_counter() - t0
        step = bvo._bq[-1][2]
        t0 = time.perf_counter()
        jax.device_get(step.fused.R_f_w)
        t_dev = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = jax.device_get((step.fused, step.pt_conv, step.ln_conv))
        t_fetch = time.perf_counter() - t0
        print(f"batched step {i}: dispatch {t_disp*1000:.1f}ms, "
              f"device+sync {t_dev*1000:.1f}ms, "
              f"full-result fetch after ready {t_fetch*1000:.1f}ms",
              flush=True)

    # --- (c) one KF detection program on a member's pyramid
    vo = bvo.vos[0]
    frame = vo.last_frame
    for trial in range(3):
        t0 = time.perf_counter()
        h = vo._dispatch_seed_detection(frame)
        t_disp = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(jax.tree.leaves(h)[0])
        t_dev = time.perf_counter() - t0
        print(f"seed-detection {trial}: dispatch {t_disp*1000:.1f}ms, "
              f"device+sync {t_dev*1000:.1f}ms", flush=True)

    # --- (b) single-seq chained step for comparison
    print("single-seq comparison...", flush=True)
    cfg1 = Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=4))
    vo1 = FrameHandlerMono(cam, cfg1)
    dev_imgs = [jnp.asarray(im) for im in imgs_h]
    for i in range(40):
        t0 = time.perf_counter()
        vo1.add_image(dev_imgs[i % n], i / 30.0)
        dt = time.perf_counter() - t0
        if i >= 36:
            print(f"single frame {i}: {dt*1000:.1f}ms", flush=True)
    vo1.flush()
    for i in range(40, 44):
        t0 = time.perf_counter()
        vo1.add_image(dev_imgs[i % n], i / 30.0)
        t_disp = time.perf_counter() - t0
        _, step = vo1._pipe_q[-1]
        t0 = time.perf_counter()
        jax.device_get(step.fused.R_f_w)
        t_dev = time.perf_counter() - t0
        print(f"single step {i}: dispatch {t_disp*1000:.1f}ms, "
              f"device+sync {t_dev*1000:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
