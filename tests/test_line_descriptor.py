import jax.numpy as jnp
import numpy as np

from plsvo_tpu import lie
from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.ops import line_descriptor as lbd
from plsvo_tpu.ops import lines as line_ops
from plsvo_tpu.utils import synthetic

CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)


def detect(img, n=24):
    det = line_ops.detect_segments(img, n_peaks=48)
    tab, _ = line_ops.dedup_segments_grid(
        det, width=320, height=240, cell_size=25, max_segs=n, min_length=25.0)
    return tab


def test_lbd_descriptors_valid(rng):
    scene = synthetic.make_scene(rng, size=1024)
    img, _ = synthetic.render_aa(scene, CAM, np.eye(3, dtype=np.float32),
                                 np.asarray([0, 0, -2.0], np.float32))
    tab = detect(img)
    desc = lbd.compute_lbd(img, tab.sp, tab.ep, tab.valid)
    v = np.asarray(desc.valid)
    assert v.sum() >= 4
    norms = np.linalg.norm(np.asarray(desc.float_desc)[v], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert set(np.unique(np.asarray(desc.binary))) <= {0, 1}


def test_lbd_matching_across_views(rng):
    """Descriptors of the same 3D lines in two nearby views must match."""
    scene = synthetic.make_scene(rng, size=1024)
    R0 = np.eye(3, dtype=np.float32)
    t0 = np.asarray([0, 0, -2.0], np.float32)
    R1 = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.01, 0.005])), np.float32)
    t1 = t0 + np.asarray([0.03, -0.01, 0.0], np.float32)
    img0, _ = synthetic.render_aa(scene, CAM, R0, t0)
    img1, _ = synthetic.render_aa(scene, CAM, R1, t1)
    tab0 = detect(img0)
    tab1 = detect(img1)
    d0 = lbd.compute_lbd(img0, tab0.sp, tab0.ep, tab0.valid)
    d1 = lbd.compute_lbd(img1, tab1.sp, tab1.ep, tab1.valid)
    m = lbd.match_binary(d0, d1)
    ok = np.asarray(m.ok)
    assert ok.sum() >= 3, f"only {ok.sum()} matches"
    # verify geometric consistency of matches: midpoints should move < 20px
    mid0 = 0.5 * (np.asarray(tab0.sp) + np.asarray(tab0.ep))
    mid1 = 0.5 * (np.asarray(tab1.sp) + np.asarray(tab1.ep))
    idx = np.asarray(m.idx)
    good = 0
    for i in np.where(ok)[0]:
        if np.linalg.norm(mid0[i] - mid1[idx[i]]) < 25:
            good += 1
    assert good >= 0.7 * ok.sum()


def test_lbd_rejects_unrelated(rng):
    # size=1024 so the textured plane fills the view: at 512 the plane's
    # physical boundary is visible at the SAME image position in both
    # renders, and those boundary-line matches are genuinely correct —
    # the scenes would not be unrelated
    scene_a = synthetic.make_scene(rng, size=1024)
    scene_b = synthetic.make_scene(rng, size=1024)
    pose = (np.eye(3, dtype=np.float32), np.asarray([0, 0, -2.0], np.float32))
    img_a, _ = synthetic.render_aa(scene_a, CAM, *pose)
    img_b, _ = synthetic.render_aa(scene_b, CAM, *pose)
    ta, tb = detect(img_a), detect(img_b)
    da = lbd.compute_lbd(img_a, ta.sp, ta.ep, ta.valid)
    db = lbd.compute_lbd(img_b, tb.sp, tb.ep, tb.valid)
    m = lbd.match_binary(da, db, max_dist=60)
    # unrelated scenes: most candidate matches rejected
    assert np.asarray(m.ok).sum() <= max(2, 0.25 * np.asarray(ta.valid).sum())
