"""Wall-clock breakdown of the pipelined tracking loop: per-frame dispatch
cost, burst (drain) cost, keyframe path cost — instrumented via permon plus
targeted monkey-timing of _drain_pipeline/_make_keyframe internals."""
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
import dataclasses

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = np.clip(np.round(np.load("/root/repo/.bench_frames.npz")["imgs"]),
               0, 255).astype(np.uint8)

cfg = Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=12))
vo = FrameHandlerMono(cam, cfg)

# wrap internals with timers
import plsvo_tpu.pipeline.frame_handler as fh
acc = {}


def wrap(obj, name):
    orig = getattr(obj, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        acc.setdefault(name, []).append(time.perf_counter() - t0)
        return out
    setattr(obj, name, timed)


for nm in ("_drain_pipeline", "_make_keyframe", "_post_fused", "_last_blob",
           "_map_tables", "_apply_harvest", "_complete_seed_init",
           "_dispatch_seed_detection"):
    wrap(vo, nm)
wrap(vo.map, "add_keyframe")

# also time the device_get inside drain by wrapping jax.device_get
orig_get = jax.device_get


def timed_get(x):
    t0 = time.perf_counter()
    out = orig_get(x)
    acc.setdefault("device_get", []).append(time.perf_counter() - t0)
    return out


jax.device_get = timed_get

frame_times = []
for i in range(len(imgs)):
    t0 = time.perf_counter()
    vo.add_image(imgs[i], i / 30.0)
    frame_times.append(time.perf_counter() - t0)
vo.flush()
jax.device_get = orig_get

ft = np.asarray(frame_times[36:]) * 1000
print(f"frames 36+: mean {ft.mean():.1f} ms  (bursts: {sorted(ft)[-4:]})")
for k, v in sorted(acc.items(), key=lambda kv: -np.sum(kv[1])):
    v = np.asarray(v) * 1000
    print(f"{k:24s}: n={len(v):3d} total={v.sum():8.1f} ms "
          f"mean={v.mean():7.2f} max={v.max():7.1f}")
