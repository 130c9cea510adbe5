import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config
from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono
from plsvo_tpu.parallel import ba

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
imgs = jnp.asarray(np.load("/root/repo/.bench_frames.npz")["imgs"])[:26]
cfg = Config()
vo = FrameHandlerMono(cam, cfg)
for i in range(26):
    vo.add_image(imgs[i], i / 30.0)
vo.flush()
m = vo.map
overl = sorted(m.overlap_kfs(vo.last_frame.R_f_w, vo.last_frame.t_f_w,
                             vo._fx, vo._fy, vo._cx, vo._cy), key=lambda kd: kd[1])
core = {k for k, _ in overl[: cfg.pipeline.core_n_kfs]}
prob, meta = ba.problem_from_window(m, cfg, sorted(core))
print("window rows:", prob.lm_pos.shape, "n_pts", meta["n_points"], "n_lines", meta["n_lines"], flush=True)

def perturb(t, e):
    return jax.tree.map(lambda a: a + e if (hasattr(a,'dtype') and jnp.issubdtype(a.dtype, jnp.floating)) else a, t)

def scanify(fn, iters):
    @jax.jit
    def run():
        def body(c, _):
            out = fn(c)
            s = sum(jnp.sum(l) for l in jax.tree.leaves(out)
                    if jnp.issubdtype(l.dtype, jnp.floating))
            return c + s * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c
    return run

def slope(fn, n=3):
    a, b = scanify(fn, 6), scanify(fn, 24)
    jax.block_until_ready(a()); jax.block_until_ready(b())
    t0 = time.perf_counter()
    for _ in range(n): jax.block_until_ready(a())
    ta = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n): jax.block_until_ready(b())
    tb = (time.perf_counter() - t0) / n
    return (tb - ta) / 18 * 1e3

def loba_gated(e):
    return ba.bundle_adjust(perturb(prob, e), n_iter=5, pose_prior=1.0)[0]

def loba_fast(e):
    return ba.bundle_adjust(perturb(prob, e), n_iter=3, pose_prior=1.0, accept_gate=False)[0]

def detect(e):
    return vo._detect_features(perturb(tuple(vo.last_frame.pyr), e))

print(f"localBA gated n5 : {slope(loba_gated):7.2f} ms", flush=True)
print(f"localBA fast  n3 : {slope(loba_fast):7.2f} ms", flush=True)
print(f"detect_features  : {slope(detect):7.2f} ms", flush=True)
