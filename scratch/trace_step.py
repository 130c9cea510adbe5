"""Op-level device-time breakdown of the fused frame step via
jax.profiler trace -> parse the xplane proto for TPU op durations."""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
for i in range(26):
    vo.add_image(imgs[i], i / 30.0)
print("state: kfs", vo.map.n_keyframes(), "seeds",
      vo._seed_alive.sum(), vo._lnseed_alive.sum(), flush=True)

inputs = vo._step_inputs(build_pyramid(imgs[27], vo.n_levels))
kwargs = vo._step_kwargs()
print("widths:", kwargs.get("pt_width"), kwargs.get("ln_width"), flush=True)

out = fused.track_frame_step(*inputs, **kwargs)
jax.block_until_ready(out)

os.system("rm -rf /tmp/jxtrace")
with jax.profiler.trace("/tmp/jxtrace"):
    outs = [fused.track_frame_step(*inputs, **kwargs) for _ in range(8)]
    jax.block_until_ready(outs)

# parse trace.json.gz (perfetto) for device-track events
files = glob.glob("/tmp/jxtrace/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
ev_by_name = {}
dev_pids = set()
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # find device process ids (name contains TPU or device)
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "tpu" in nm or "Device" in nm or "device" in nm.lower():
                dev_pids.add(e["pid"])
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            nm = e.get("name", "")
            ev_by_name.setdefault(nm, [0, 0.0])
            ev_by_name[nm][0] += 1
            ev_by_name[nm][1] += e.get("dur", 0.0)

tot = sum(v[1] for v in ev_by_name.items().__iter__().__next__()[1:]) if False else \
    sum(v[1] for _, v in ev_by_name.items())
rows = sorted(ev_by_name.items(), key=lambda kv: -kv[1][1])
print(f"device pids: {dev_pids}; total device us over 8 steps: {tot:.0f}"
      f" -> {tot/8/1000:.2f} ms/step")
for nm, (cnt, dur) in rows[:45]:
    print(f"{dur/8/1000:8.3f} ms  x{cnt:5d}  {nm[:110]}")
