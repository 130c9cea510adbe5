import jax.numpy as jnp
import numpy as np

from plsvo_tpu import lie
from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.image import build_pyramid
from plsvo_tpu.ops import detection, homography, klt
from plsvo_tpu.utils import synthetic

CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)


def make_pair(rng, dt=(0.15, 0.02, 0.0), drot=0.02):
    scene = synthetic.make_scene(rng, size=1024, texel_size=0.004)
    R_ref = np.eye(3, dtype=np.float32)
    t_ref = np.array([0.0, 0.0, -2.0], np.float32)
    R_cur = np.asarray(lie.so3_exp(jnp.asarray([0.0, drot, 0.0])), np.float32)
    t_cur = t_ref + np.asarray(dt, np.float32)
    img_ref, _ = synthetic.render_aa(scene, CAM, R_ref, t_ref)
    img_cur, _ = synthetic.render_aa(scene, CAM, R_cur, t_cur)
    Rcr, tcr = lie.compose(*lie.inverse(jnp.asarray(R_cur), jnp.asarray(t_cur)),
                           jnp.asarray(R_ref), jnp.asarray(t_ref))
    return scene, (R_ref, t_ref), (R_cur, t_cur), img_ref, img_cur, (np.asarray(Rcr), np.asarray(tcr))


def detect_uv(img, cap=128):
    pyr = build_pyramid(img, 5)
    grid = detection.detect_fast_grid(pyr, cell_size=20)
    uv = np.asarray(grid.uv)
    sc = np.asarray(grid.score)
    v = np.asarray(grid.valid)
    order = np.argsort(-sc)[:cap]
    return uv[order], v[order]


def test_klt_tracks_with_large_disparity(rng):
    scene, pose_ref, pose_cur, img_ref, img_cur, (Rcr, tcr) = make_pair(rng)
    uv, v = detect_uv(img_ref)
    pyr_ref = build_pyramid(img_ref, 4)
    pyr_cur = build_pyramid(img_cur, 4)
    uv_cur, ok, disp = klt.track_klt(pyr_ref, pyr_cur, jnp.asarray(uv), jnp.asarray(v))
    ok = np.asarray(ok)
    assert ok.sum() > 30
    # ground truth projection
    rays = np.asarray(CAM.unproject(jnp.asarray(uv)))
    z = np.asarray(synthetic.depth_at(scene, CAM, jnp.asarray(pose_ref[0]),
                                      jnp.asarray(pose_ref[1]), jnp.asarray(uv)))
    xyz = rays * (z / rays[:, 2])[:, None]
    xyz_cur = xyz @ Rcr.T + tcr
    uv_gt = np.asarray(CAM.project(jnp.asarray(xyz_cur), distort=False))
    err = np.linalg.norm(np.asarray(uv_cur) - uv_gt, axis=-1)
    assert np.median(err[ok]) < 0.3
    # disparity should be large (wide baseline)
    assert np.median(np.asarray(disp)[ok]) > 15.0


def test_ransac_homography_synthetic_exact(rng):
    # plane z=3 in ref frame, known relative pose
    n_pts = 100
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    np.full(n_pts, 3.0)], -1).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray([0.2, -0.1, 0.05, 0.03, -0.05, 0.02]))
    R, t = np.asarray(R), np.asarray(t)
    cur = pts @ R.T + t
    src = pts[:, :2] / pts[:, 2:]
    dst = cur[:, :2] / cur[:, 2:]
    # 20% outliers
    dst_noisy = dst.copy()
    out_idx = rng.choice(n_pts, 20, replace=False)
    dst_noisy[out_idx] += rng.uniform(0.05, 0.2, (20, 2)) * rng.choice([-1, 1], (20, 2))
    import jax
    H, inl, n_in = homography.ransac_homography(
        jnp.asarray(src), jnp.asarray(dst_noisy), jnp.ones(n_pts, bool),
        jax.random.PRNGKey(1), jnp.asarray(2.0 / 250.0))
    inl = np.asarray(inl)
    assert int(n_in) > 80 - 20 - 5
    assert inl[out_idx].sum() <= 2
    # H maps src->dst for clean points
    err = np.asarray(homography._transfer_error(H, jnp.asarray(src), jnp.asarray(dst)))
    clean = np.ones(n_pts, bool)
    clean[out_idx] = False
    assert np.median(err[clean]) < 1e-3


def test_homography_init_recovers_pose_and_depth(rng):
    n_pts = 120
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    np.full(n_pts, 3.0)], -1).astype(np.float32)
    R_gt, t_gt = lie.se3_exp(jnp.asarray([0.2, -0.1, 0.05, 0.03, -0.05, 0.02]))
    R_gt, t_gt = np.asarray(R_gt), np.asarray(t_gt)
    cur = pts @ R_gt.T + t_gt
    f_ref = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    f_cur = cur / np.linalg.norm(cur, axis=-1, keepdims=True)
    res = homography.homography_init(
        f_ref.astype(np.float32), f_cur.astype(np.float32),
        np.ones(n_pts, bool), focal=250.0)
    assert res.ok
    assert res.inliers.sum() > 100
    # rotation must match exactly; translation up to scale
    ang = np.arccos(np.clip((np.trace(res.R_cur_ref @ R_gt.T) - 1) / 2, -1, 1))
    assert ang < 2e-3, ang
    t_dir = res.t_cur_ref / np.linalg.norm(res.t_cur_ref)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    assert min(np.linalg.norm(t_dir - t_gt_dir), np.linalg.norm(t_dir + t_gt_dir)) < 0.02
    # depths proportional to GT ranges
    m = res.inliers
    gt_rng = np.linalg.norm(pts, axis=-1)
    ratio = res.depths_ref[m] / gt_rng[m]
    assert np.std(ratio) / np.mean(ratio) < 0.02


def test_homography_init_end_to_end_images(rng):
    scene, pose_ref, pose_cur, img_ref, img_cur, (Rcr, tcr) = make_pair(rng)
    uv, v = detect_uv(img_ref, cap=200)
    pyr_ref = build_pyramid(img_ref, 4)
    pyr_cur = build_pyramid(img_cur, 4)
    uv_cur, ok, disp = klt.track_klt(pyr_ref, pyr_cur, jnp.asarray(uv), jnp.asarray(v))
    ok = np.asarray(ok)
    f_ref = np.asarray(CAM.unproject(jnp.asarray(uv)))
    f_cur = np.asarray(CAM.unproject(uv_cur))
    res = homography.homography_init(f_ref, f_cur, ok, focal=250.0)
    assert res.ok
    # compare rotation with GT, translation direction up to scale
    ang = np.arccos(np.clip((np.trace(res.R_cur_ref @ Rcr.T) - 1) / 2, -1, 1))
    assert ang < 0.01, ang
    t_dir = res.t_cur_ref / np.linalg.norm(res.t_cur_ref)
    gt_dir = tcr / np.linalg.norm(tcr)
    assert min(np.linalg.norm(t_dir - gt_dir), np.linalg.norm(t_dir + gt_dir)) < 0.05
