import time, os
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
imgs = jnp.asarray(np.load("/root/repo/.bench_frames.npz")["imgs"])
imgs.block_until_ready()
LOBA = os.environ.get("LOBA", "1") == "1"
cfg = Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=12,
                                     loba_enabled=LOBA))
for p in range(2):
    vo = FrameHandlerMono(cam, cfg)
    t_all = time.perf_counter()
    n_def, t_def = 0, 0.0
    for i, img in enumerate(imgs):
        t0 = time.perf_counter()
        vo.add_image(img, i / 30.0)
        dt = time.perf_counter() - t0
        if i > len(imgs) // 2:
            n_def += 1; t_def += dt
    vo.flush()
    total = time.perf_counter() - t_all
print(f"LOBA={LOBA}: total {total*1e3:.0f} ms  steady {t_def/n_def*1e3:.2f} ms/frame ({n_def/t_def:.1f} fps)")
