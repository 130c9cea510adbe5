import dataclasses
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from conftest import *  # noqa
from test_pipeline import CAM, fast_config, make_sequence, run_pipeline
from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono

rng = np.random.default_rng(0)
scene, poses, imgs = make_sequence(rng)
cfg = fast_config()

vo_s, res_s = run_pipeline(imgs, cfg)
for r in res_s:
    print("sync", r.frame_id, r.stage, r.quality, r.n_pt_matches,
          r.is_keyframe)

cfg_p = dataclasses.replace(
    cfg, pipeline=dataclasses.replace(
        cfg.pipeline, pipelined=True, pipeline_depth=1))
vo_p = FrameHandlerMono(CAM, cfg_p)
res_p = []
for i, img in enumerate(imgs):
    r = vo_p.add_image(img, i / 30.0)
    print(f"add {i} stage={vo_p.stage} -> "
          f"{None if r is None else (r.frame_id, r.stage, r.quality, r.n_pt_matches)}")
    if r is not None:
        res_p.append(r)
res_p.extend(vo_p.flush())
print("pipelined ids:", [r.frame_id for r in res_p])
