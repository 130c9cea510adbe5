"""Count device-program launches (eager primitives + pjit calls) per
steady-state frame, with call-site attribution."""
import collections
import time
import traceback
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
imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
staged = jnp.asarray(imgs.astype(np.float32))
staged.block_until_ready()
imgs_dev = [staged[i] for i in range(len(imgs))]

cfg = Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=12))

vo = FrameHandlerMono(cam, cfg)
for i, im in enumerate(imgs_dev):
    vo.add_image(im, i / 30.0)
vo.flush()

# instrument
from jax._src import dispatch as jdispatch
from jax._src import pjit as jpjit

counts = collections.Counter()
enabled = [False]

orig_apply = jdispatch.apply_primitive


def patched_apply(prim, *a, **k):
    if enabled[0]:
        st = traceback.extract_stack(limit=14)
        site = "?"
        for fr in reversed(st):
            if "/plsvo_tpu/" in fr.filename:
                site = f"{fr.filename.split('/')[-1]}:{fr.lineno}"
                break
        counts[f"eager {prim.name} @ {site}"] += 1
    return orig_apply(prim, *a, **k)


jdispatch.apply_primitive = patched_apply

orig_cm = jpjit._python_pjit_helper if hasattr(jpjit, "_python_pjit_helper") else None

# count pjit executions via the C++ fast path is hard; count via
# jax.monitoring events instead
pjit_counts = collections.Counter()
try:
    from jax._src import monitoring

    def listener(event, **kw):
        if enabled[0] and "pjit" in event:
            pjit_counts[event] += 1
    monitoring.register_event_listener(listener)
except Exception:
    pass

vo = FrameHandlerMono(cam, cfg)
for i, im in enumerate(imgs_dev[:30]):
    vo.add_image(im, i / 30.0)
enabled[0] = True
n = 0
for i, im in enumerate(imgs_dev[30:66]):
    vo.add_image(im, 1.0 + i / 30.0)
    n += 1
enabled[0] = False
print(f"over {n} steady frames:")
tot = 0
for k, c in counts.most_common(40):
    print(f"  {c/n:6.2f}/frame  {k}")
    tot += c
print(f"eager total: {tot/n:.2f}/frame")
for k, c in pjit_counts.most_common(10):
    print(f"  pjit {c/n:.2f}/frame {k}")
vo.flush()
