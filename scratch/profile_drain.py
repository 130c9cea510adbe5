"""Inside _complete_drains: is the cost fut.result() or the bookkeeping?"""
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

vo = FrameHandlerMono(cam, cfg)
ev = []
import concurrent.futures


class TimedFut:
    def __init__(self, fut):
        self.fut = fut

    def done(self):
        return self.fut.done()

    def result(self):
        was_done = self.fut.done()
        t0 = time.perf_counter()
        r = self.fut.result()
        ev.append(("result", vo.frame_id, was_done,
                   time.perf_counter() - t0))
        return r


from plsvo_tpu.pipeline import fused
orig_submit = fused.submit_fetch
fused.submit_fetch = lambda flat: TimedFut(orig_submit(flat))

from plsvo_tpu.parallel import ba as ba_mod
orig_wb = ba_mod.write_back_window


def timed_wb(*a, **k):
    t0 = time.perf_counter()
    r = orig_wb(*a, **k)
    ev.append(("wb", vo.frame_id, None, time.perf_counter() - t0))
    return r


ba_mod.write_back_window = timed_wb

t0_all = time.perf_counter()
for i, im in enumerate(imgs_dev):
    vo.add_image(im, i / 30.0)
vo.flush()
print(f"total {(time.perf_counter()-t0_all)/len(imgs_dev)*1e3:.1f} ms/frame")
for kind, fid, was_done, dt in ev:
    print(f"  {kind} f{fid} done_at_entry={was_done} {dt*1e3:.1f}ms")
