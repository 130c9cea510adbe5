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
from compare_lsd import run_lsd

rng = np.random.default_rng(5)
W, H = 752, 480
cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
scene = synthetic.make_scene(rng, size=2048, texel_size=0.003)
img, _ = synthetic.render_aa(scene, cam, np.eye(3, dtype=np.float32),
                             np.array([0, 0, -2.0], np.float32))
img_np = np.asarray(img)
min_len = 0.05 * min(W, H)
lsd = run_lsd(img_np, min_len)

def ours_all(**kw):
    TX, TY = 4, 3
    rows = []
    dets = [(line_ops.detect_segments(jnp.asarray(img_np), n_peaks=64, **kw), (0,0))]
    tw, th = W // TX, H // TY
    for ty in range(TY):
        for tx in range(TX):
            crop = img_np[ty*th:(ty+1)*th, tx*tw:(tx+1)*tw]
            d = line_ops.detect_segments(jnp.asarray(crop), n_peaks=16,
                                         max_edge_px=1024, **kw)
            dets.append((d, (tx*tw, ty*th)))
    for det, (ox, oy) in dets:
        v = np.asarray(det.valid)
        sp = np.asarray(det.sp)[v] + [ox, oy]
        ep = np.asarray(det.ep)[v] + [ox, oy]
        L = np.linalg.norm(ep - sp, axis=-1)
        k = L >= min_len
        rows.append(np.concatenate([sp[k], ep[k]], -1))
    return np.concatenate(rows, 0)

ours = ours_all(run_gap_px=3.0, dist_tol=1.2)
# per-LSD-match: signed overhang of our endpoints beyond the LSD segment
overh = []
for (x1,y1,x2,y2) in lsd:
    p,q = np.array([x1,y1]), np.array([x2,y2]); L=np.linalg.norm(q-p)
    if L<1: continue
    d=(q-p)/L; n=np.array([-d[1],d[0]])
    best=None; bc=0
    for (a1,b1,a2,b2) in ours:
        s,e=np.array([a1,b1]),np.array([a2,b2])
        if max(abs(np.dot(s-p,n)),abs(np.dot(e-p,n)))>2.5: continue
        ts,te=np.dot(s-p,d),np.dot(e-p,d)
        lo,hi=min(ts,te),max(ts,te)
        cover=(min(hi,L)-max(lo,0))/L
        if cover>bc: bc=cover; best=(lo,hi)
    if bc>=0.5:
        lo,hi=best
        overh.append((lo, hi-L))  # negative lo = start overhang, positive hi-L = end overhang
overh=np.array(overh)
print("start offset: mean %.2f med %.2f" % (overh[:,0].mean(), np.median(overh[:,0])))
print("end   offset: mean %.2f med %.2f" % (overh[:,1].mean(), np.median(overh[:,1])))
print("abs overhang p90:", np.percentile(np.abs(overh),90))
