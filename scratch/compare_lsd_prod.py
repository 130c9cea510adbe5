"""Production-config detector (tiled, per frame_handler settings) vs LSD."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from plsvo_tpu.ops import lines as line_ops
from plsvo_tpu.utils import synthetic
from plsvo_tpu.camera import PinholeCamera
from compare_lsd import seg_metrics, run_lsd

rng = np.random.default_rng(5)
W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
scene = synthetic.make_scene(rng, size=2048, texel_size=0.003)
img, _ = synthetic.render_aa(scene, cam, np.eye(3, dtype=np.float32),
                             np.array([0, 0, -2.0], np.float32))
img_np = np.asarray(img)
for min_frac in (0.05, 0.15):
    min_len = min_frac * min(W, H)
    det = line_ops.detect_segments_tiled(jnp.asarray(img_np), n_peaks=64,
                                         run_gap_px=3.0, dist_tol=1.2)
    v = np.asarray(det.valid) & (np.asarray(det.length) >= min_len)
    ours = np.concatenate([np.asarray(det.sp)[v], np.asarray(det.ep)[v]], -1)
    print(f"min_len={min_frac}:", seg_metrics(ours, run_lsd(img_np, min_len)))
