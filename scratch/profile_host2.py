"""Method-level wall-time breakdown of the pipelined single-seq steady
state: monkeypatch cumulative timers around every host-path method."""
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
from plsvo_tpu.pipeline.state import FrameState
from plsvo_tpu.pipeline import fused

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
staged = jnp.asarray(imgs.astype(np.float32))
staged.block_until_ready()
imgs_dev = [staged[i] for i in range(len(imgs))]

cfg = Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=12))

CUM = {}


def wrap(obj, name, label=None):
    fn = getattr(obj, name)
    lab = label or name

    def wrapped(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            CUM[lab] = CUM.get(lab, 0.0) + (time.perf_counter() - t0)
    setattr(obj, name, wrapped)


# pass 0: warm
vo = FrameHandlerMono(cam, cfg)
for i, im in enumerate(imgs_dev):
    vo.add_image(im, i / 30.0)
vo.flush()

# pass 1: instrumented, measure steady frames only
vo = FrameHandlerMono(cam, cfg)
for name in ("_post_fused", "_apply_harvest", "_map_tables", "_last_blob",
             "_make_keyframe", "_complete_pending_ba", "_complete_seed_init",
             "_initiate_drain", "_complete_drains", "_need_new_kf",
             "_dispatch_seed_detection", "_dispatch_local_ba",
             "_step_kwargs"):
    wrap(vo, name)
wrap(FrameState, "empty", "FrameState.empty")
wrap(fused, "flatpack")
wrap(fused, "flatunpack")
wrap(fused, "track_frame_step_tables", "step_dispatch")

N_WARM = 24
ts = []
t_run0 = None
for i, im in enumerate(imgs_dev):
    if i == N_WARM:
        CUM.clear()
        t_run0 = time.perf_counter()
    t0 = time.perf_counter()
    vo.add_image(im, i / 30.0)
    ts.append(time.perf_counter() - t0)
t_run = time.perf_counter() - t_run0
n = len(imgs_dev) - N_WARM
print(f"steady frames {n}: {t_run/n*1e3:.2f} ms/frame "
      f"({n/t_run:.1f} fps)")
for k, v in sorted(CUM.items(), key=lambda kv: -kv[1]):
    print(f"  {k:28s} {v/n*1e3:7.2f} ms/frame")
vo.flush()
