"""EDGELET feature class: detection in corner-free cells, align1D routing
in the matcher, and e2e contribution (reference defines the class at
feature.h:54-73 and routes it at matcher.cpp:191-207 but never detects one;
here the class is live)."""
import jax.numpy as jnp
import numpy as np
import pytest

from plsvo_tpu.ops import detection
from plsvo_tpu.ops.feature_align import align1d_atlas, ref_patch_gradients


def _edge_image(H=120, W=160, x_edge=80.5):
    """Vertical intensity step (pure edge: zero corners, strong gradient)."""
    xx = np.arange(W, dtype=np.float32)
    img = 40.0 + 160.0 / (1.0 + np.exp(-(xx - x_edge) * 1.2))
    return np.tile(img[None, :], (H, 1))


def test_detect_edgelets_on_pure_edge():
    img = jnp.asarray(_edge_image())
    eg = detection.detect_edgelets_grid(img, cell_size=25, mag_threshold=20.0)
    eg = np.asarray(eg.valid), np.asarray(eg.uv), np.asarray(eg.grad_dir)
    valid, uv, gd = eg
    assert valid.sum() >= 3  # one per cell column containing the edge
    # winners sit on the edge, direction is the x gradient
    assert np.all(np.abs(uv[valid][:, 0] - 80.5) < 2.0), uv[valid]
    assert np.all(np.abs(np.abs(gd[valid][:, 0]) - 1.0) < 0.05)
    # a FAST corner detector finds nothing here
    cg = detection.detect_fast_grid([img], cell_size=25)
    assert int(np.asarray(cg.valid).sum()) == 0


def test_align1d_atlas_moves_only_along_direction():
    from plsvo_tpu.image import pack_pyramid_atlas

    rng = np.random.default_rng(0)
    img = jnp.asarray(_edge_image() + rng.normal(0, 1.0, (120, 160)))
    atlas, x_off, sizes = pack_pyramid_atlas([img])
    # reference patch extracted at the true edge position
    ps = 8
    B = ps + 2
    cy_, cx_ = 60.0, 80.5
    yy, xx = np.meshgrid(np.arange(B) - B / 2 + 0.5,
                         np.arange(B) - B / 2 + 0.5, indexing="ij")
    from plsvo_tpu.image import bilinear_sample
    pos = jnp.asarray(
        np.stack([cx_ + xx.ravel(), cy_ + yy.ravel()], -1)[None])
    patch_b, _ = bilinear_sample(img, pos)
    ref, dx, dy = ref_patch_gradients(patch_b, ps)

    # start displaced 2px along x; align1d along (1,0) must recover it
    uv0 = jnp.asarray([[cx_ + 2.0, cy_]])
    d = jnp.asarray([[1.0, 0.0]])
    out = align1d_atlas(atlas, x_off, sizes, ref, dx, dy, uv0, d,
                        jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
                        patch_size=ps)
    assert bool(out.converged[0])
    uv = np.asarray(out.uv[0])
    assert abs(uv[0] - cx_) < 0.35, uv
    assert abs(uv[1] - cy_) < 1e-5, uv  # never moved off-direction


def test_pipeline_edgelets_contribute():
    """E2E on an EDGE-dominant scene (big uniform rectangles, few blobs —
    the low-texture regime PL-SVO targets): edgelet landmarks are created
    and get matched by the tracking path."""
    from tests.test_pipeline import CAM, run_pipeline
    from plsvo_tpu.config import fast_config
    from plsvo_tpu.utils import synthetic

    rng = np.random.default_rng(5)
    scene = synthetic.make_scene(rng, size=1024, texel_size=0.004,
                                 n_blobs=80, n_rects=25)
    imgs = []
    for i in range(40):
        ang = 0.003 * i
        R = np.asarray(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        t = np.asarray([0.022 * i, 0.006 * np.sin(0.3 * i), -2.0],
                       np.float32)
        img, _ = synthetic.render_aa(scene, CAM, jnp.asarray(R),
                                     jnp.asarray(t))
        imgs.append(np.asarray(img))
    vo, results = run_pipeline(imgs, fast_config())
    m = vo.map
    edge_rows = (m.pt_anchor_type == 1) & (m.pt_status > 0)
    assert edge_rows.sum() > 0, "no edgelet landmarks created"
    # matched at least once (success counter) — edgelets contribute
    assert (m.pt_n_succ[edge_rows] > 0).any(), \
        (edge_rows.sum(), m.pt_n_succ[edge_rows])
