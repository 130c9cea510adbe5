import jax.numpy as jnp
import numpy as np
import pytest

from plsvo_tpu.ops import lines


def seg_img(h=240, w=320):
    """A few bright bars on dark ground -> strong straight edges."""
    img = np.full((h, w), 40.0, np.float32)
    img[60:80, 40:280] = 220.0  # horizontal bar -> two horizontal lines
    img[120:200, 150:170] = 220.0  # vertical bar
    return img


def _dist_point_to_seg_line(p, sp, ep):
    d = ep - sp
    n = np.array([-d[1], d[0]]) / (np.linalg.norm(d) + 1e-9)
    return abs(np.dot(p - sp, n))


def test_detect_segments_finds_bars():
    img = jnp.asarray(seg_img())
    segs = lines.detect_segments(img, n_peaks=32)
    v = np.asarray(segs.valid)
    sp = np.asarray(segs.sp)[v]
    ep = np.asarray(segs.ep)[v]
    ln = np.asarray(segs.length)[v]
    ang = np.asarray(segs.angle)[v]
    assert v.sum() >= 4
    long = ln > 60
    assert long.sum() >= 3
    # among long segments there must be near-horizontal and near-vertical ones
    horiz = np.abs(ang[long]) < 0.1
    vert = np.abs(np.abs(ang[long]) - np.pi / 2) < 0.1
    assert horiz.any() and vert.any()
    # a horizontal long segment should lie near y=60 or y=80
    ys = 0.5 * (sp[long][horiz][:, 1] + ep[long][horiz][:, 1])
    assert (np.minimum(np.abs(ys - 60), np.abs(ys - 80)) < 3).any()


def test_detect_segments_empty_on_flat():
    img = jnp.full((120, 160), 100.0)
    segs = lines.detect_segments(img, n_peaks=16)
    assert int(np.asarray(segs.valid).sum()) == 0


def test_dedup_grid_capacity_and_occupancy():
    img = jnp.asarray(seg_img())
    segs = lines.detect_segments(img, n_peaks=32)
    table, occ = lines.dedup_segments_grid(
        segs, width=320, height=240, cell_size=25, max_segs=8, min_length=30.0)
    v = np.asarray(table.valid)
    assert table.sp.shape == (8, 2)
    assert v.sum() >= 2
    # all accepted segments meet the min length
    assert (np.asarray(table.length)[v] > 30.0).all()
    # occupancy was marked
    assert np.asarray(occ).sum() >= 2 * v.sum() - 2


def test_dedup_rejects_occupied():
    img = jnp.asarray(seg_img())
    segs = lines.detect_segments(img, n_peaks=32)
    occ_all = jnp.ones(((-(-320 // 25)) * (-(-240 // 25)),), bool)
    table, _ = lines.dedup_segments_grid(
        segs, width=320, height=240, cell_size=25, max_segs=8, min_length=30.0,
        occupied=occ_all)
    assert int(np.asarray(table.valid).sum()) == 0


def _seg_metrics(ours, lsd):
    """Recall of oracle segments (covered >=50% within 2.5px) + mean
    matched-endpoint error. ours/lsd: (N,4) [x1,y1,x2,y2]."""
    recovered, ep_errs = 0, []
    for (x1, y1, x2, y2) in lsd:
        p, q = np.array([x1, y1]), np.array([x2, y2])
        L = np.linalg.norm(q - p)
        if L < 1:
            continue
        d = (q - p) / L
        n = np.array([-d[1], d[0]])
        best_cover, best_ep = 0.0, None
        for (a1, b1, a2, b2) in ours:
            s, e = np.array([a1, b1]), np.array([a2, b2])
            if max(abs(np.dot(s - p, n)), abs(np.dot(e - p, n))) > 2.5:
                continue
            ts = np.clip(np.dot(s - p, d), 0, L)
            te = np.clip(np.dot(e - p, d), 0, L)
            cover = abs(te - ts) / L
            if cover > best_cover:
                best_cover = cover
                best_ep = min(
                    np.linalg.norm(s - p) + np.linalg.norm(e - q),
                    np.linalg.norm(s - q) + np.linalg.norm(e - p)) / 2
        if best_cover >= 0.5:
            recovered += 1
            ep_errs.append(best_ep)
    rec = recovered / max(1, len(lsd))
    return rec, (float(np.mean(ep_errs)) if ep_errs else np.nan)


def _ours_vs_lsd(img_np, min_len, **kw):
    import cv2

    from plsvo_tpu.ops import lines as line_ops

    kw.setdefault("run_gap_px", 3.0)
    det = line_ops.detect_segments_tiled(
        jnp.asarray(img_np, jnp.float32), n_peaks=64, dist_tol=1.2, **kw)
    v = np.asarray(det.valid) & (np.asarray(det.length) >= min_len)
    ours = np.concatenate([np.asarray(det.sp)[v], np.asarray(det.ep)[v]], -1)
    out = cv2.createLineSegmentDetector().detect(
        np.clip(img_np, 0, 255).astype(np.uint8))[0]
    lsd = np.zeros((0, 4)) if out is None else out.reshape(-1, 4)
    L = np.hypot(lsd[:, 2] - lsd[:, 0], lsd[:, 3] - lsd[:, 1])
    return ours, lsd[L >= min_len]


def test_detector_vs_lsd_synthetic(rng):
    """Quantitative parity vs OpenCV LSD (the reference's actual detector,
    LSDDetector_custom.cpp:246-253) at the production length gate
    (lsd_min_length * H*W/(H+W), feature_detection.cpp:154). The tiled
    Hough must recover most LSD segments with tight endpoints."""
    pytest.importorskip("cv2")
    from plsvo_tpu.camera import PinholeCamera
    from plsvo_tpu.utils import synthetic

    W, H = 752, 480
    cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
    scene = synthetic.make_scene(rng, size=2048, texel_size=0.003)
    img, _ = synthetic.render_aa(scene, cam, np.eye(3, dtype=np.float32),
                                 np.array([0, 0, -2.0], np.float32))
    min_len = 0.15 * (W * H) / (W + H)
    ours, lsd = _ours_vs_lsd(np.asarray(img), min_len)
    assert len(lsd) >= 10  # oracle sanity
    rec, ep = _seg_metrics(ours, lsd)
    # measured on this scene: recall 0.85, mean matched-endpoint err 9.6 px
    # (the mean is tail-dominated: dense collinear clutter overextends a
    # few runs — an inherent infinite-line-model limit vs LSD's region
    # growing; VO endpoints are re-refined by the depth filter's subpixel
    # alignment, ops/depth_filter.py)
    assert rec >= 0.7, (rec, ep)
    assert ep <= 12.0, (rec, ep)
    assert len(ours) >= 0.5 * len(lsd)


def test_detector_vs_lsd_real_photo():
    """Same parity check on a REAL photograph (matplotlib's grace_hopper
    sample) — thresholds tuned on rendered textures must transfer to
    camera imagery."""
    pytest.importorskip("cv2")
    from PIL import Image
    import matplotlib.cbook as cbook

    with cbook.get_sample_data("grace_hopper.jpg") as f:
        img = np.asarray(Image.open(f).convert("L"), np.float32)
    H, W = img.shape
    min_len = 0.15 * (W * H) / (W + H)
    # DEFAULT (adaptive) budgets — no photo-special-cased knobs
    ours, lsd = _ours_vs_lsd(img, min_len, run_gap_px=6.0)
    assert len(lsd) >= 5
    rec, ep = _seg_metrics(ours, lsd)
    # measured: recall 0.78 with the adaptive budgets (0.50 with the old
    # fixed 752x480-tuned budgets); mean endpoint error is tail-dominated
    # by infinite-line overextension in collinear clutter (same caveat as
    # the synthetic test)
    assert rec >= 0.7, (rec, ep, len(ours), len(lsd))
    assert ep <= 15.0, (rec, ep)
    assert len(ours) >= len(lsd)


def test_dedup_np_matches_device(rng):
    """The host (numpy) dedup used on fetched raw candidate tables must
    accept exactly the same segments as the jitted device dedup."""
    import jax.numpy as jnp

    S = 80
    sp = rng.uniform(5, 300, (S, 2)).astype(np.float32)
    ep = sp + rng.uniform(-80, 80, (S, 2)).astype(np.float32)
    length = np.linalg.norm(ep - sp, axis=-1).astype(np.float32)
    tab = lines.SegmentTable(
        sp=jnp.asarray(sp), ep=jnp.asarray(ep), length=jnp.asarray(length),
        angle=jnp.zeros(S, jnp.float32), response=jnp.asarray(length),
        valid=jnp.asarray(rng.random(S) > 0.2))
    kw = dict(width=320, height=240, cell_size=25, max_segs=24,
              min_length=20.0)
    dev, _ = lines.dedup_segments_grid(tab, **kw)
    hst = lines.dedup_segments_grid_np(tab, **kw)
    nd = int(np.asarray(dev.valid).sum())
    nh = int(hst.valid.sum())
    assert nd == nh, (nd, nh)
    np.testing.assert_allclose(np.asarray(dev.sp)[: nd], hst.sp[: nh])
    np.testing.assert_allclose(np.asarray(dev.ep)[: nd], hst.ep[: nh])
