"""Where does WALL time go in pipelined single-seq tracking? Phase timers
around the drain machinery: dispatch path, drain concat+submit, future
wait, window bookkeeping, keyframe path. Device-resident frames (no image
upload in the loop), warm pass first."""
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
from plsvo_tpu.pipeline import frame_handler as fh_mod, fused

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = jnp.asarray(np.load("/root/repo/.bench_frames.npz")["imgs"])
imgs.block_until_ready()
cfg = Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=12))

T = {}


def add(k, dt):
    T[k] = T.get(k, 0.0) + dt


def timed(obj, name, key):
    orig = getattr(obj, name)

    def wrap(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        add(key, time.perf_counter() - t0)
        return out
    setattr(obj, name, wrap)
    return orig


for p in range(2):
    vo = FrameHandlerMono(cam, cfg)
    if p == 1:
        T.clear()
        timed(vo, "_initiate_drain", "drain_submit")
        timed(vo, "_post_fused", "post_fused")
        timed(vo, "_make_keyframe", "keyframe_path")
        timed(vo, "_apply_harvest", "harvest")
        timed(vo, "_last_blob", "last_blob")
        timed(vo, "_map_tables", "map_tables")
        # split _complete_drains into wait vs bookkeeping
        orig_cd = vo._complete_drains

        def cd(force):
            t0 = time.perf_counter()
            if vo._fetch_q and force:
                fut = vo._fetch_q[0][3]
                fut.result()
                add("drain_wait", time.perf_counter() - t0)
            t1 = time.perf_counter()
            orig_cd(force)
            add("drain_book", time.perf_counter() - t1)
        vo._complete_drains = cd
    t_all = time.perf_counter()
    n_def = 0
    t_def = 0.0
    from plsvo_tpu.pipeline.frame_handler import STAGE_DEFAULT

    for i, img in enumerate(imgs):
        t0 = time.perf_counter()
        r = vo.add_image(img, i / 30.0)
        dt = time.perf_counter() - t0
        if i > len(imgs) // 2:
            n_def += 1
            t_def += dt
    vo.flush()
    total = time.perf_counter() - t_all
    if p == 1:
        print(f"total {total*1e3:.0f} ms  steady {t_def/n_def*1e3:.2f} ms/frame "
              f"({n_def/t_def:.1f} fps)")
        acc = sum(T.values())
        for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
            print(f"  {k:14s}: {v*1e3:7.1f} ms total  "
                  f"({v/len(imgs)*1e3:5.2f} ms/frame)")
        print(f"  (timed sum {acc*1e3:.0f} ms of {total*1e3:.0f})")
