"""r5: can line-only mode sustain the SHARED default gates
(quality_min_fts=20 etc., reference frame_handler_mono.cpp:101-125 swaps
detectors not gates) on a line-RICH scene?"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import dataclasses
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import fast_config
from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono
from plsvo_tpu.utils import synthetic

CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)

n_rects = int(sys.argv[1]) if len(sys.argv) > 1 else 420
n_blobs = int(sys.argv[2]) if len(sys.argv) > 2 else 40

rng = np.random.default_rng(7)
scene = synthetic.make_scene(rng, size=1024, texel_size=0.004,
                             n_rects=n_rects, n_blobs=n_blobs)
imgs = []
for i in range(28):
    ang = 0.003 * i
    R = np.asarray([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                    [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    t = np.asarray([0.022 * i, 0.006 * np.sin(0.3 * i), -2.0], np.float32)
    imgs.append(np.asarray(synthetic.render_aa(
        scene, CAM, jnp.asarray(R), jnp.asarray(t))[0]))

cfg = fast_config()
cfg = dataclasses.replace(
    cfg, pipeline=dataclasses.replace(cfg.pipeline, has_pt=False))
vo = FrameHandlerMono(CAM, cfg)
for i, img in enumerate(imgs):
    r = vo.add_image(img, i / 30.0)
    print(f"frame {i}: stage={r.stage} q={r.quality} "
          f"npt={r.n_pt_matches} nseg={r.n_seg_matches} kf={r.is_keyframe}")
