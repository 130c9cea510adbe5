"""Per-stage wall-clock breakdown of the tracking frame loop on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import Config
from plsvo_tpu.pipeline.frame_handler import STAGE_DEFAULT, FrameHandlerMono
from plsvo_tpu.pipeline import fused
from plsvo_tpu.utils import synthetic
from plsvo_tpu.image import build_pyramid

W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
rng = np.random.default_rng(3)
scene = synthetic.make_scene(rng, size=2048, texel_size=0.003)

n_frames = 26
Rs, ts_ = [], []
for i in range(n_frames):
    ang = 0.002 * i
    Rs.append(np.asarray(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
         [-np.sin(ang), 0, np.cos(ang)]], np.float32))
    ts_.append(np.asarray([0.03 * i, 0.008 * np.sin(0.3 * i), -2.0], np.float32))
imgs = synthetic.render_batch_aa(scene, cam, np.stack(Rs), np.stack(ts_), ss=2)
imgs.block_until_ready()
print("rendered")

vo = FrameHandlerMono(cam, Config())
# instrument _process_frame stages by monkey-wrapping
orig_process = vo._process_frame
stats = {}


def rec(k, dt):
    stats.setdefault(k, []).append(dt)


def instrumented(pyr, ts):
    t0 = time.perf_counter()
    last = vo.last_frame
    from plsvo_tpu.pipeline.state import FrameState
    frame = FrameState.empty(vo.cfg, vo.frame_id, ts, pyr,
                             last.R_f_w.copy(), last.t_f_w.copy())
    inputs = vo._fused_inputs(pyr)
    t1 = time.perf_counter(); rec("build_inputs", t1 - t0)
    res_dev = fused.track_frame_core_blob(
        *inputs, specs=vo._blob_specs(), **vo._fused_kwargs())
    t2 = time.perf_counter(); rec("dispatch", t2 - t1)
    jax.block_until_ready(res_dev)
    t3 = time.perf_counter(); rec("device_compute(core)", t3 - t2)
    pt_pending = vo._pt_converged_dev
    ln_pending = vo._ln_converged_dev
    handles = tuple(h for h in (pt_pending, ln_pending) if h is not None)
    got = jax.device_get((res_dev,) + handles)
    t4 = time.perf_counter(); rec("fetch", t4 - t3)
    res = got[0]
    vo._apply_harvest(got[1:], pt_pending is not None, ln_pending is not None)
    t5 = time.perf_counter(); rec("harvest_apply", t5 - t4)
    # _post_fused minus seeds
    orig_update = vo._update_seeds
    tseed = [0.0, 0.0]
    def timed_update(frame_):
        ta = time.perf_counter()
        orig_update(frame_)
        jax.block_until_ready((vo.pt_seeds.mu, vo.ln_seeds.mu_s))
        tseed[0] = time.perf_counter() - ta
    vo._update_seeds = timed_update
    r = vo._post_fused(frame, res)
    vo._update_seeds = orig_update
    t6 = time.perf_counter()
    rec("seed_update(sync'd)", tseed[0])
    rec("post_host", t6 - t5 - tseed[0])
    rec("total", t6 - t0)
    return r


vo._process_frame = instrumented

for i, img in enumerate(imgs):
    t0 = time.perf_counter()
    r = vo.add_image(img, i / 30.0)
    print(f"frame {i}: {r.stage} {r.quality} npt={r.n_pt_matches} "
          f"kf={r.is_keyframe} {(time.perf_counter()-t0)*1000:.0f}ms")

print("\n--- stage medians (default frames, skipping first 3) ---")
for k, v in stats.items():
    arr = np.asarray(v[3:]) if len(v) > 6 else np.asarray(v)
    print(f"{k:24s}: {np.median(arr)*1000:8.1f} ms  (max {np.max(arr)*1000:.1f})")
