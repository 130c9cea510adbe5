"""Batched streams phase of bench.py in isolation (A/B across code states)."""
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from plsvo_tpu.camera import PinholeCamera
    from plsvo_tpu.config import Config, PipelineConfig
    from plsvo_tpu.parallel.multi_vo import BatchedVO

    W, H = 752, 480
    cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
    imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
    n_frames = imgs.shape[0]
    B = 8
    bvo = BatchedVO(cam, Config(pipeline=PipelineConfig(
        pipelined=True, pipeline_depth=8)), B, mode="streams")
    imgs_h = [np.clip(np.round(np.asarray(im)), 0, 255).astype(np.uint8)
              for im in imgs]
    bt = []
    for i in range(n_frames):
        t0 = time.perf_counter()
        bvo.add_images([imgs_h[max(0, i - k)] for k in range(B)], i / 30.0)
        dt = time.perf_counter() - t0
        all_def = all(s == "default" for s in bvo.stages)
        bt.append((dt, all_def))
        print(f"batched frame {i}: {dt*1000:.1f}ms "
              f"stages={set(bvo.stages)}", file=sys.stderr)
    bvo.flush()
    defaults = [dt for dt, ok in bt if ok]
    steady_b = defaults[len(defaults) // 2:] if len(defaults) > 6 else defaults
    per = float(np.mean(steady_b))
    print(f"steady agg fps: {B / per:.2f}  per-round {per*1000:.1f}ms "
          f"({len(steady_b)} rounds)")


if __name__ == "__main__":
    main()
