import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config, PipelineConfig
from plsvo_tpu.pipeline import fused
from plsvo_tpu.parallel.multi_vo import BatchedVO

NW = int(os.environ.get("NW", "1"))
if NW > 1:
    import concurrent.futures
    fused._FETCH_POOL = concurrent.futures.ThreadPoolExecutor(
        max_workers=NW, thread_name_prefix="plsvo-fetch")

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
imgs_h = [np.clip(np.round(im), 0, 255).astype(np.uint8) for im in imgs]
B = 8
for _p in range(2):
    bvo = BatchedVO(cam, Config(pipeline=PipelineConfig(
        pipelined=True, pipeline_depth=8)), B, mode="streams")
    bt = []
    for i in range(len(imgs_h)):
        t0 = time.perf_counter()
        bvo.add_images([imgs_h[max(0, i - k)] for k in range(B)], i / 30.0)
        bt.append((time.perf_counter() - t0,
                   all(s == "default" for s in bvo.stages)))
    bvo.flush()
d = [dt for dt, ok in bt if ok]
steady = d[len(d) // 2:]
print(f"NW={NW}: batched streams agg {B/np.mean(steady):.1f} fps")
