"""r5: cProfile the vmapped BatchedVO path to decompose the steady ~75 ms
frames and the multi-second drain stalls. Prints top functions by cumtime
plus per-frame wall with a phase-tagged breakdown."""
import cProfile
import io
import pstats
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
    B = 8
    imgs_h = [np.clip(np.round(np.asarray(im)), 0, 255).astype(np.uint8)
              for im in imgs]
    n = imgs.shape[0]

    # pass 0: warm every program variant
    for _pass in range(2):
        bvo = BatchedVO(cam, Config(pipeline=PipelineConfig(
            pipelined=True, pipeline_depth=8)), B, mode="vmap")
        prof = cProfile.Profile() if _pass == 1 else None
        times = []
        t_all = time.perf_counter()
        if prof:
            prof.enable()
        for i in range(n):
            t0 = time.perf_counter()
            bvo.add_images([imgs_h[max(0, i - k)] for k in range(B)],
                           i / 30.0)
            dt = time.perf_counter() - t0
            times.append(dt)
            print(f"pass{_pass} frame {i}: {dt*1e3:.1f}ms "
                  f"stages={set(bvo.stages)}", flush=True)
        bvo.flush()
        if prof:
            prof.disable()
            total = time.perf_counter() - t_all
            print(f"TOTAL pass1: {total:.2f}s  "
                  f"agg_fps={B*n/total:.1f}", flush=True)
            s = io.StringIO()
            ps = pstats.Stats(prof, stream=s)
            ps.sort_stats("cumulative").print_stats(45)
            print(s.getvalue())
            s = io.StringIO()
            ps = pstats.Stats(prof, stream=s)
            ps.sort_stats("tottime").print_stats(35)
            print(s.getvalue())


if __name__ == "__main__":
    main()
