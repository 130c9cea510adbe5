import jax.numpy as jnp
import numpy as np

from plsvo_tpu import lie
from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.image import build_pyramid, extract_patches, patch_offsets
from plsvo_tpu.ops import feature_align, matcher
from plsvo_tpu.utils import synthetic

CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)
FX, FY, CX, CY = CAM.fx, CAM.fy, CAM.cx, CAM.cy


def bordered_patches(img, centers, patch_size=8):
    return extract_patches(img, centers, patch_size + 2)[0]


def make_pair(rng, dt=(0.03, -0.015, 0.01), drot=0.015):
    scene = synthetic.make_scene(rng, size=1024, texel_size=0.004)
    R_ref = np.eye(3, dtype=np.float32)
    t_ref = np.array([0.0, 0.0, -2.0], np.float32)
    R_cur = np.asarray(lie.so3_exp(jnp.asarray([0.0, drot, 0.5 * drot])), np.float32)
    t_cur = t_ref + np.asarray(dt, np.float32)
    img_ref, _ = synthetic.render_aa(scene, CAM, R_ref, t_ref)
    img_cur, _ = synthetic.render_aa(scene, CAM, R_cur, t_cur)
    Rcr, tcr = lie.compose(*lie.inverse(jnp.asarray(R_cur), jnp.asarray(t_cur)),
                           jnp.asarray(R_ref), jnp.asarray(t_ref))
    return scene, (R_ref, t_ref), (R_cur, t_cur), img_ref, img_cur, (Rcr, tcr)


def gt_points(rng, scene, pose, n=32, border=30):
    R, t = pose
    uv = np.stack([rng.uniform(border, 320 - border, n),
                   rng.uniform(border, 240 - border, n)], -1).astype(np.float32)
    rays = np.asarray(CAM.unproject(jnp.asarray(uv)))
    z = np.asarray(synthetic.depth_at(scene, CAM, jnp.asarray(R), jnp.asarray(t), jnp.asarray(uv)))
    rng_d = z / rays[:, 2]
    return uv, rays, rng_d


def test_align2d_recovers_shift(rng):
    scene, pose_ref, pose_cur, img_ref, img_cur, _ = make_pair(rng, dt=(0, 0, 0), drot=0)
    uv, _, _ = gt_points(rng, scene, pose_ref, n=24)
    pb = bordered_patches(img_ref, jnp.asarray(uv))
    ref_patch, dx, dy = feature_align.ref_patch_gradients(pb, 8)
    uv_init = uv + rng.uniform(-2, 2, uv.shape).astype(np.float32)
    out = feature_align.align2d(img_ref, ref_patch, dx, dy,
                                jnp.asarray(uv_init), jnp.ones(len(uv), bool))
    err = np.linalg.norm(np.asarray(out.uv) - uv, axis=-1)
    conv = np.asarray(out.converged)
    assert conv.mean() > 0.7
    assert np.median(err[conv]) < 0.08


def test_align2d_mean_diff_robustness(rng):
    """Photometric offset between frames is absorbed by the mean_diff param."""
    scene, pose_ref, _, img_ref, _, _ = make_pair(rng, dt=(0, 0, 0), drot=0)
    uv, _, _ = gt_points(rng, scene, pose_ref, n=16)
    pb = bordered_patches(img_ref, jnp.asarray(uv))
    ref_patch, dx, dy = feature_align.ref_patch_gradients(pb, 8)
    img_bright = img_ref + 20.0
    uv_init = uv + rng.uniform(-1.5, 1.5, uv.shape).astype(np.float32)
    out = feature_align.align2d(img_bright, ref_patch, dx, dy,
                                jnp.asarray(uv_init), jnp.ones(len(uv), bool))
    conv = np.asarray(out.converged)
    err = np.linalg.norm(np.asarray(out.uv) - uv, axis=-1)
    assert conv.mean() > 0.6
    assert np.median(err[conv]) < 0.12
    # r = I_cur - I_ref + mean_diff  =>  mean_diff -> -brightness_offset
    assert abs(np.median(np.asarray(out.mean_diff)[conv]) + 20.0) < 2.0


def test_align1d_moves_only_along_direction(rng):
    scene, pose_ref, _, img_ref, _, _ = make_pair(rng, dt=(0, 0, 0), drot=0)
    uv, _, _ = gt_points(rng, scene, pose_ref, n=16)
    pb = bordered_patches(img_ref, jnp.asarray(uv))
    ref_patch, dx, dy = feature_align.ref_patch_gradients(pb, 8)
    d = np.tile(np.asarray([[1.0, 0.0]], np.float32), (len(uv), 1))
    uv_init = uv + np.asarray([1.2, 0.0], np.float32)
    out = feature_align.align1d(img_ref, ref_patch, dx, dy,
                                jnp.asarray(uv_init), jnp.asarray(d),
                                jnp.ones(len(uv), bool))
    conv = np.asarray(out.converged)
    assert conv.mean() > 0.5
    err_x = np.abs(np.asarray(out.uv)[:, 0] - uv[:, 0])
    err_y = np.abs(np.asarray(out.uv)[:, 1] - uv[:, 1])
    assert np.median(err_x[conv]) < 0.15
    np.testing.assert_allclose(err_y, 1.2 * 0 + np.abs(uv_init[:, 1] - uv[:, 1]), atol=1e-5)


def test_warp_affine_identity():
    uv = jnp.asarray([[160.0, 120.0]])
    f = CAM.unproject(uv)
    A = matcher.get_warp_affine(FX, FY, CX, CY, uv, f, jnp.asarray([2.0]),
                                jnp.asarray([0]), jnp.eye(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(A)[0], np.eye(2), atol=1e-3)


def test_best_search_level():
    A = jnp.asarray([np.eye(2), 2 * np.eye(2), 4 * np.eye(2)])
    lv = np.asarray(matcher.best_search_level(A, 4))
    assert list(lv) == [0, 1, 2]  # det 1 -> 0; det 4 -> 1; det 16 -> 2


def test_triangulate_depth_exact(rng):
    p = np.asarray([0.3, -0.2, 2.5], np.float32)
    R, t = lie.se3_exp(jnp.asarray([0.1, -0.05, 0.02, 0.01, 0.02, -0.01]))
    f_ref = jnp.asarray(p / np.linalg.norm(p))
    p_cur = np.asarray(R) @ p + np.asarray(t)
    f_cur = jnp.asarray(p_cur / np.linalg.norm(p_cur))
    d_ref, d_cur, ok = matcher.triangulate_depth(R, jnp.asarray(t), f_ref, f_cur)
    assert bool(ok)
    np.testing.assert_allclose(float(d_ref), np.linalg.norm(p), rtol=1e-4)
    np.testing.assert_allclose(float(d_cur), np.linalg.norm(p_cur), rtol=1e-4)


def test_find_match_direct_on_pair(rng):
    scene, pose_ref, pose_cur, img_ref, img_cur, (Rcr, tcr) = make_pair(rng)
    uv, rays, rng_d = gt_points(rng, scene, pose_ref, n=48)
    ok_d = np.isfinite(rng_d) & (rng_d > 0.1)

    pyr_ref = build_pyramid(img_ref, 3)
    pyr_cur = build_pyramid(img_cur, 3)
    ref_stack = [p[None] for p in pyr_ref]  # single keyframe stack
    N = len(uv)

    xyz_ref = rays * rng_d[:, None]
    xyz_cur = xyz_ref @ np.asarray(Rcr).T + np.asarray(tcr)
    uv_cur_gt = np.asarray(CAM.project(jnp.asarray(xyz_cur), distort=False))
    in_cur = (uv_cur_gt[:, 0] > 20) & (uv_cur_gt[:, 0] < 300) & \
             (uv_cur_gt[:, 1] > 20) & (uv_cur_gt[:, 1] < 220)
    uv_init = uv_cur_gt + rng.uniform(-2, 2, uv_cur_gt.shape).astype(np.float32)

    res = matcher.find_match_direct(
        ref_stack, pyr_cur,
        jnp.zeros(N, jnp.int32), jnp.asarray(uv), jnp.asarray(rays),
        jnp.asarray(rng_d), jnp.zeros(N, jnp.int32),
        jnp.tile(np.asarray(Rcr)[None], (N, 1, 1)), jnp.tile(np.asarray(tcr)[None], (N, 1)),
        jnp.asarray(uv_init), jnp.asarray(ok_d & in_cur),
        FX, FY, CX, CY, max_level=2)
    ok = np.asarray(res.ok)
    assert ok.sum() > 0.5 * (ok_d & in_cur).sum()
    err = np.linalg.norm(np.asarray(res.uv) - uv_cur_gt, axis=-1)
    assert np.median(err[ok]) < 0.3


def test_epipolar_search_finds_depth(rng):
    scene, pose_ref, pose_cur, img_ref, img_cur, (Rcr, tcr) = make_pair(
        rng, dt=(0.12, 0.0, 0.0), drot=0.0)  # wide baseline in x
    uv, rays, rng_d = gt_points(rng, scene, pose_ref, n=32)
    ok_d = np.isfinite(rng_d) & (rng_d > 0.1)
    N = len(uv)

    pyr_cur = build_pyramid(img_cur, 3)
    # unwarped ref patches (views are close enough in appearance)
    ref_patch, pok = extract_patches(img_ref, jnp.asarray(uv), 8)

    d_min = rng_d * 0.7
    d_max = rng_d * 1.4
    xyz_min = rays * d_min[:, None]
    xyz_max = rays * d_max[:, None]
    f_A = (xyz_max @ np.asarray(Rcr).T + np.asarray(tcr))
    f_B = (xyz_min @ np.asarray(Rcr).T + np.asarray(tcr))

    res = matcher.epipolar_search_zmssd(
        pyr_cur, ref_patch, jnp.asarray(f_A), jnp.asarray(f_B),
        jnp.zeros(N, jnp.int32), jnp.asarray(ok_d) & pok,
        FX, FY, CX, CY, n_steps=96)
    ok = np.asarray(res.ok)
    assert ok.sum() > 0.5 * ok_d.sum()

    # refine with align2d then triangulate and compare with GT depth
    pb = bordered_patches(img_ref, jnp.asarray(uv))
    rp, dx, dy = feature_align.ref_patch_gradients(pb, 8)
    ref2 = feature_align.align2d(pyr_cur[0], rp, dx, dy, res.uv_level, jnp.asarray(ok))
    f_cur = CAM.unproject(ref2.uv)
    d_ref, d_cur, tri_ok = matcher.triangulate_depth(
        jnp.asarray(Rcr), jnp.asarray(tcr), jnp.asarray(rays), f_cur)
    m = np.asarray(ref2.converged) & np.asarray(tri_ok) & ok
    assert m.sum() >= 8
    rel = np.abs(np.asarray(d_ref)[m] - rng_d[m]) / rng_d[m]
    assert np.median(rel) < 0.02
