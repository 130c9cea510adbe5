"""Why does _complete_pending_ba block? Per-call wait times + pending count.

(Historical note: the measurements cited by frame_handler._dispatch_local_ba
were taken against the pre-r3 variant where _pending_ba entries carried
their own background-fetch futures; entries are now (handles, meta) —
this script reports wait time + count for the CURRENT format.)"""
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
orig = vo._complete_pending_ba
events = []


def patched():
    n = len(vo._pending_ba)  # entries are (handles, meta); one flat fetch
    if n:
        t0 = time.perf_counter()
        orig()
        events.append((vo.frame_id, n, None, time.perf_counter() - t0))
    else:
        orig()


vo._complete_pending_ba = patched

# also trace dispatch_local_ba duration (host-side problem build + dispatch)
orig_d = vo._dispatch_local_ba
disp = []


def patched_d(frame):
    t0 = time.perf_counter()
    orig_d(frame)
    disp.append((vo.frame_id, time.perf_counter() - t0))


vo._dispatch_local_ba = patched_d

for i, im in enumerate(imgs_dev):
    vo.add_image(im, i / 30.0)
vo.flush()
print("BA waits (frame, n_pending, done_flags, wait_ms):")
for fid, n, done, dt in events:
    print(f"  f{fid}: n={n} done={done} wait={dt*1e3:.1f}ms")
print("BA dispatches (frame, ms):")
for fid, dt in disp:
    print(f"  f{fid}: {dt*1e3:.1f}ms")
