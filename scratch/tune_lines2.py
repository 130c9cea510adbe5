import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import cv2
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

def run_cfg(name, **kw):
    TX, TY = kw.pop("TX", 4), kw.pop("TY", 3)
    tpeaks = kw.pop("tile_peaks", 16)
    rows = []
    detG = line_ops.detect_segments(jnp.asarray(img_np), n_peaks=64, **kw)
    tw, th = W // TX, H // TY
    dets = [(detG, (0, 0))]
    for ty in range(TY):
        for tx in range(TX):
            crop = img_np[ty*th:(ty+1)*th, tx*tw:(tx+1)*tw]
            d = line_ops.detect_segments(jnp.asarray(crop), n_peaks=tpeaks,
                                         max_edge_px=1024, **kw)
            dets.append((d, (tx*tw, ty*th)))
    for det, (ox, oy) in dets:
        v = np.asarray(det.valid)
        sp = np.asarray(det.sp)[v] + [ox, oy]
        ep = np.asarray(det.ep)[v] + [ox, oy]
        L = np.linalg.norm(ep - sp, axis=-1)
        k = L >= min_len
        rows.append(np.concatenate([sp[k], ep[k]], -1))
    ours = np.concatenate(rows, 0)
    print(name, seg_metrics(ours, lsd))

run_cfg("D gap3 tol1.2", run_gap_px=3.0, dist_tol=1.2)
run_cfg("E gap3 tol1.2 ang0.25", run_gap_px=3.0, dist_tol=1.2, angle_tol=0.25)
run_cfg("F 5x4 tiles p24 gap3 tol1.2", TX=5, TY=4, tile_peaks=24,
        run_gap_px=3.0, dist_tol=1.2)
run_cfg("G gap2 tol1.0", run_gap_px=2.0, dist_tol=1.0)
