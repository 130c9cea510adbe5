import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import cv2
from functools import partial

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
min_len = 0.05 * min(W, H)
lsd = run_lsd(img_np, min_len)

def collect(det_list):
    rows = []
    for det, (ox, oy) in det_list:
        v = np.asarray(det.valid)
        sp = np.asarray(det.sp)[v] + [ox, oy]
        ep = np.asarray(det.ep)[v] + [ox, oy]
        L = np.linalg.norm(ep - sp, axis=-1)
        k = L >= min_len
        rows.append(np.concatenate([sp[k], ep[k]], -1))
    return np.concatenate(rows, 0) if rows else np.zeros((0, 4))

# config A: current global
detA = line_ops.detect_segments(jnp.asarray(img_np), n_peaks=64)
print("A global64:", seg_metrics(collect([(detA, (0, 0))]), lsd))

# config B: global + 4x3 tiles of 188x160, 16 peaks each
tiles = []
TX, TY = 4, 3
tw, th = W // TX, H // TY
for ty in range(TY):
    for tx in range(TX):
        crop = img_np[ty*th:(ty+1)*th, tx*tw:(tx+1)*tw]
        d = line_ops.detect_segments(jnp.asarray(crop), n_peaks=16,
                                     max_edge_px=1024)
        tiles.append((d, (tx*tw, ty*th)))
print("B global+tiles:", seg_metrics(collect([(detA, (0,0))] + tiles), lsd))

# config C: B with tighter run gap
detC = line_ops.detect_segments(jnp.asarray(img_np), n_peaks=64, run_gap_px=3.0)
tilesC = []
for ty in range(TY):
    for tx in range(TX):
        crop = img_np[ty*th:(ty+1)*th, tx*tw:(tx+1)*tw]
        d = line_ops.detect_segments(jnp.asarray(crop), n_peaks=16,
                                     max_edge_px=1024, run_gap_px=3.0)
        tilesC.append((d, (tx*tw, ty*th)))
print("C gap3:", seg_metrics(collect([(detC, (0,0))] + tilesC), lsd))
