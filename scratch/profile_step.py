"""Device-time breakdown of the fused frame step: time N chained dispatches
with ONE sync, toggling components. Uses real handler state captured after a
short tracking run so shapes/occupancy are realistic."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config
from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono
from plsvo_tpu.pipeline import fused
from plsvo_tpu.utils import synthetic

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
rng = np.random.default_rng(3)

cache = "/root/repo/.bench_frames.npz"
imgs = jnp.asarray(np.load(cache)["imgs"])[:30]
imgs.block_until_ready()

cfg = Config()
vo = FrameHandlerMono(cam, cfg)
for i in range(24):
    vo.add_image(imgs[i], i / 30.0)
print("state ready: stage", vo.stage, "kfs", vo.map.n_keyframes(),
      "seeds", vo._seed_alive.sum(), vo._lnseed_alive.sum())

from plsvo_tpu.image import build_pyramid
inputs = vo._step_inputs(build_pyramid(imgs[25], vo.n_levels))
kwargs = vo._step_kwargs()


def timeit(label, kw, n=30):
    out = fused.track_frame_step(*inputs, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fused.track_frame_step(*inputs, **kw) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:48s}: {dt:7.2f} ms")
    return dt


full = timeit("full step", kwargs)
kw = dict(kwargs); kw["update_pt_seeds"] = False; kw["update_ln_seeds"] = False
noseed = timeit("no seed updates", kw)
kw2 = dict(kw); kw2["n_struct_pts"] = 1; kw2["n_struct_segs"] = 1; kw2["struct_iters"] = 1
timeit("no seeds, minimal struct", kw2)
kw3 = dict(kw2); kw3["poseopt_iters"] = 1
timeit("no seeds, min struct, 1 poseopt iter", kw3)
kw4 = dict(kw3); kw4["n_iter_align"] = 1
timeit("+ 1 align iter", kw4)
kw5 = dict(kw4); kw5["max_pts_out"] = 8; kw5["max_segs_out"] = 8
timeit("+ reproject max_out 8 (align2D refine shrunk)", kw5)
kw6 = dict(kwargs); kw6["n_iter_align"] = 1
timeit("full, 1 align iter", kw6)
kw7 = dict(kwargs); kw7["poseopt_iters"] = 1
timeit("full, 1 poseopt iter", kw7)
kw8 = dict(kwargs); kw8["n_struct_pts"] = 1; kw8["n_struct_segs"] = 1; kw8["struct_iters"] = 1
timeit("full, minimal struct", kw8)
print("seed widths:", kwargs.get("pt_width"), kwargs.get("ln_width"))
