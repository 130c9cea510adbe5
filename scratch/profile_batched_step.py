"""Device-time slope of the B=8 vmapped batched step vs 8x the single step."""
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
from plsvo_tpu.image import build_pyramid

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = jnp.asarray(np.load("/root/repo/.bench_frames.npz")["imgs"])[:30]
cfg = Config()
vo = FrameHandlerMono(cam, cfg)
for i in range(24):
    vo.add_image(imgs[i], i / 30.0)
pl_ = cfg.pipeline
pyr = tuple(build_pyramid(imgs[25], vo.n_levels))
kwargs = vo._step_kwargs()
kwargs["pt_width"] = None
kwargs["ln_width"] = None
kwargs["update_pt_seeds"] = True
kwargs["update_ln_seeds"] = True
B = 8
inp = (vo.last_frame.pyr, pyr, vo.map.kf_atlas_flat(pl_.n_pyr_levels),
       vo._last_blob(vo.last_frame), vo._map_tables(),
       jnp.asarray(vo.batch_counter, jnp.int32))
inputs = tuple(inp for _ in range(B))
pt_stack = jax.tree.map(lambda a: jnp.stack([a] * B), vo.pt_seeds)
ln_stack = jax.tree.map(lambda a: jnp.stack([a] * B), vo.ln_seeds)
fxj, fyj, cxj, cyj = cam.fx, cam.fy, cam.cx, cam.cy


def perturb(t, e):
    return jax.tree.map(
        lambda a: a + e if (hasattr(a, "dtype")
                            and jnp.issubdtype(a.dtype, jnp.floating))
        else a, t)


def scanify(fn, iters):
    @jax.jit
    def run():
        def body(c, _):
            o = fn(c)
            leaves = [l for l in jax.tree.leaves(o)
                      if hasattr(l, "dtype")
                      and jnp.issubdtype(l.dtype, jnp.floating)]
            return c + sum(jnp.sum(l) for l in leaves) * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c
    return run


def slope(fn, lo=6, hi=30, n=3):
    rlo, rhi = scanify(fn, lo), scanify(fn, hi)
    jax.block_until_ready(rlo()); jax.block_until_ready(rhi())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(rlo())
    tlo = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(rhi())
    thi = (time.perf_counter() - t0) / n
    return (thi - tlo) / (hi - lo) * 1e3


def single(eps):
    return fused.track_frame_step(
        *perturb(inp[:5], eps),
        perturb(vo.pt_seeds, eps), perturb(vo.ln_seeds, eps), inp[5],
        fxj, fyj, cxj, cyj, emit_next=True,
        frame_id=jnp.asarray(25, jnp.int32), **kwargs)


def batched(eps):
    kw = {k: v for k, v in kwargs.items() if k != "specs"}
    return fused.track_frame_step_list(
        perturb(inputs, eps), perturb(pt_stack, eps), perturb(ln_stack, eps),
        fxj, fyj, cxj, cyj, specs=kwargs["specs"], emit_next=True,
        frame_ids=tuple(jnp.asarray(25, jnp.int32) for _ in range(B)), **kw)


print(f"single step (full widths): {slope(single):8.2f} ms", flush=True)
print(f"vmapped B=8 step         : {slope(batched, lo=3, hi=12):8.2f} ms",
      flush=True)
