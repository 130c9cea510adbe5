"""Quantitative comparison: our Hough detector vs OpenCV LSD (oracle).

Metrics: segment count, recall of LSD segments (an LSD segment is
recovered if some detected segment covers >=50% of its length within
2px), endpoint error on matched pairs."""
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


def seg_metrics(ours, lsd):
    """ours/lsd: (N,4) arrays [x1,y1,x2,y2]."""
    if len(lsd) == 0 or len(ours) == 0:
        return dict(recall=0.0, mean_ep_err=np.nan, n_ours=len(ours), n_lsd=len(lsd))
    recovered = 0
    ep_errs = []
    for (x1, y1, x2, y2) in lsd:
        p, q = np.array([x1, y1]), np.array([x2, y2])
        L = np.linalg.norm(q - p)
        if L < 1:
            continue
        d = (q - p) / L
        n = np.array([-d[1], d[0]])
        best_cover = 0.0
        best_ep = None
        for (a1, b1, a2, b2) in ours:
            s, e = np.array([a1, b1]), np.array([a2, b2])
            # both endpoints within 2.5px of the LSD infinite line?
            ds = abs(np.dot(s - p, n)); de = abs(np.dot(e - p, n))
            if max(ds, de) > 2.5:
                continue
            ts = np.clip(np.dot(s - p, d), 0, L)
            te = np.clip(np.dot(e - p, d), 0, L)
            cover = abs(te - ts) / L
            if cover > best_cover:
                best_cover = cover
                best_ep = min(np.linalg.norm(s - p) + np.linalg.norm(e - q),
                              np.linalg.norm(s - q) + np.linalg.norm(e - p)) / 2
        if best_cover >= 0.5:
            recovered += 1
            ep_errs.append(best_ep)
    return dict(recall=recovered / max(1, len(lsd)),
                mean_ep_err=float(np.mean(ep_errs)) if ep_errs else np.nan,
                n_ours=len(ours), n_lsd=len(lsd))


def run_ours(img_np, min_len):
    det = line_ops.detect_segments(jnp.asarray(img_np, jnp.float32), n_peaks=64)
    v = np.asarray(det.valid) & (np.asarray(det.length) >= min_len)
    sp, ep = np.asarray(det.sp)[v], np.asarray(det.ep)[v]
    return np.concatenate([sp, ep], -1)


def run_lsd(img_np, min_len):
    lsd = cv2.createLineSegmentDetector()
    out = lsd.detect(np.clip(img_np, 0, 255).astype(np.uint8))[0]
    if out is None:
        return np.zeros((0, 4))
    segs = out.reshape(-1, 4)
    L = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
    return segs[L >= min_len]


if __name__ == "__main__":
    rng = np.random.default_rng(5)
    W, H = 752, 480
    cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
    scene = synthetic.make_scene(rng, size=2048, texel_size=0.003)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, -2.0], np.float32)
    img, _ = synthetic.render_aa(scene, cam, R, t)
    img_np = np.asarray(img)
    min_len = 0.05 * min(W, H)  # short-segment regime
    ours = run_ours(img_np, min_len)
    lsd = run_lsd(img_np, min_len)
    m = seg_metrics(ours, lsd)
    print("synthetic:", m)
    # also the reference min-length regime (0.15*min)
    min_len2 = 0.15 * min(W, H)
    m2 = seg_metrics(run_ours(img_np, min_len2), run_lsd(img_np, min_len2))
    print("synthetic (long only):", m2)
