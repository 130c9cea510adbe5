"""Direct timing: one track_frame_step_tables execution vs one K=8 burst
execution (block_until_ready), repeated — separates device compute from
per-execution tunnel overhead."""
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
from plsvo_tpu.pipeline import fused
from plsvo_tpu.image import build_pyramid

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
imgs_u8 = np.clip(np.round(imgs), 0, 255).astype(np.uint8)

cfg = Config(pipeline=PipelineConfig(pipelined=True, pipeline_depth=12))
vo = FrameHandlerMono(cam, cfg)
for i in range(26):
    vo.add_image(jnp.asarray(imgs[i]), i / 30.0)
vo.flush()
print("state ready", flush=True)

pl = cfg.pipeline
pyr = tuple(build_pyramid(jnp.asarray(imgs[26]), vo.n_levels))
kf_flat = vo.map.kf_atlas_flat(pl.n_pyr_levels)
mt = vo._map_tables()
kwargs = vo._step_kwargs()
kw_t = {k: v for k, v in kwargs.items() if k != "specs"}

# build a chain start
step0 = fused.track_frame_step(
    vo.last_frame.pyr if vo.last_frame.pyr is not None else vo._chain_pyr,
    pyr, kf_flat, vo._last_blob(vo.last_frame), mt,
    vo.pt_seeds, vo.ln_seeds, jnp.asarray(vo.batch_counter, jnp.int32),
    cam.fx, cam.fy, cam.cx, cam.cy, emit_next=True,
    frame_id=jnp.asarray(26, jnp.int32), **kwargs)
jax.block_until_ready(step0.fused.t_f_w)


def time_n(fn, n=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


# 1. single step execution, blocked each time
def one_step():
    s = fused.track_frame_step_tables(
        pyr, pyr, kf_flat, step0.next, mt, vo.pt_seeds, vo.ln_seeds,
        jnp.asarray(vo.batch_counter, jnp.int32),
        cam.fx, cam.fy, cam.cx, cam.cy,
        frame_id=jnp.asarray(27, jnp.int32), **kw_t)
    jax.block_until_ready(s.fused.t_f_w)


# 2. D steps queued, one block at the end
def steps_queued(D=8):
    outs = []
    s = None
    for d in range(D):
        s = fused.track_frame_step_tables(
            pyr, pyr, kf_flat,
            step0.next if s is None else s.next, mt,
            vo.pt_seeds, vo.ln_seeds,
            jnp.asarray(vo.batch_counter, jnp.int32),
            cam.fx, cam.fy, cam.cx, cam.cy,
            frame_id=jnp.asarray(27 + d, jnp.int32), **kw_t)
        outs.append(s.fused.t_f_w)
    jax.block_until_ready(outs)


# 3. one K=8 burst execution
imgs_b = jnp.asarray(imgs_u8[26:34])


def one_burst():
    carry, ys = fused.track_frames_burst(
        pyr, imgs_b, kf_flat, step0.next, mt, vo.pt_seeds, vo.ln_seeds,
        jnp.asarray(vo.batch_counter, jnp.int32),
        cam.fx, cam.fy, cam.cx, cam.cy,
        frame_id0=26, n_pyr_total=vo.n_levels, **kw_t)
    jax.block_until_ready(ys[0].t_f_w)


print(f"single step (blocked)   : {time_n(one_step):7.1f} ms", flush=True)
print(f"8 steps queued, 1 block : {time_n(steps_queued):7.1f} ms "
      f"({time_n(steps_queued)/8:.1f}/frame)", flush=True)
print(f"K=8 burst (blocked)     : {time_n(one_burst):7.1f} ms "
      f"({time_n(one_burst)/8:.1f}/frame)", flush=True)
