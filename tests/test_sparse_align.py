import jax.numpy as jnp
import numpy as np
import pytest

from plsvo_tpu import lie
from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.image import build_pyramid
from plsvo_tpu.ops import detection, sparse_align
from plsvo_tpu.utils import synthetic


CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)


def T_cur_from_ref(R_w_ref, t_w_ref, R_w_cur, t_w_cur):
    Rrw, trw = lie.inverse(jnp.asarray(R_w_cur), jnp.asarray(t_w_cur))
    return lie.compose(Rrw, trw, jnp.asarray(R_w_ref), jnp.asarray(t_w_ref))


def setup_pair(rng, dt=(0.02, -0.01, 0.008), drot=0.01):
    scene = synthetic.make_scene(rng, size=1024, texel_size=0.004)
    R_ref = np.eye(3, dtype=np.float32)
    t_ref = np.array([0.0, 0.0, -2.0], np.float32)
    R_cur = np.asarray(lie.so3_exp(jnp.asarray([0.0, drot, drot * 0.5])), np.float32) @ R_ref
    t_cur = t_ref + np.asarray(dt, np.float32)
    img_ref, _ = synthetic.render_aa(scene, CAM, R_ref, t_ref, ss=2)
    img_cur, _ = synthetic.render_aa(scene, CAM, R_cur, t_cur, ss=2)
    return scene, (R_ref, t_ref), (R_cur, t_cur), img_ref, img_cur


def ref_points(scene, pose_ref, img_ref, n_cap=192):
    """Detected corners + exact GT range -> AlignPoints."""
    R_ref, t_ref = pose_ref
    pyr = build_pyramid(img_ref, 5)
    grid = detection.detect_fast_grid(pyr, cell_size=20)
    uv = np.asarray(grid.uv)
    valid = np.asarray(grid.valid)
    order = np.argsort(-np.asarray(grid.score))
    sel = order[: n_cap]
    uv = uv[sel]
    valid = valid[sel]
    bear = CAM.unproject(jnp.asarray(uv))
    rays_c = np.asarray(bear)
    z = np.asarray(synthetic.depth_at(scene, CAM, jnp.asarray(R_ref), jnp.asarray(t_ref), jnp.asarray(uv)))
    rng_depth = z / rays_c[:, 2]
    valid = valid & np.isfinite(rng_depth) & (rng_depth > 0.1)
    return sparse_align.AlignPoints(
        xyz_ref=jnp.asarray(rays_c * rng_depth[:, None], jnp.float32),
        uv_ref=jnp.asarray(uv, jnp.float32),
        valid=jnp.asarray(valid),
    )


def empty_segments(M=8, K=4):
    return sparse_align.AlignSegments(
        xyz_ref=jnp.zeros((M, K, 3), jnp.float32),
        uv_ref=jnp.zeros((M, K, 2), jnp.float32),
        valid=jnp.zeros((M,), bool),
    )


def pose_err(R_est, t_est, R_gt, t_gt):
    ang, dist = lie.distance(R_est, t_est, jnp.asarray(R_gt), jnp.asarray(t_gt))
    return float(ang), float(dist)


def reproj_err_px(R_est, t_est, R_gt, t_gt, xyz_ref):
    """Mean level-0 pixel deviation between est and GT projections of the
    tracked 3D points. On a planar scene small tx and small rot_y are nearly
    indistinguishable (homography ambiguity), so raw pose error overstates
    tracking error; image-space consistency is the meaningful metric."""
    xyz = xyz_ref.reshape(-1, 3)

    def proj(R, t):
        p = xyz @ np.asarray(R).T + np.asarray(t)
        return np.stack([250.0 * p[:, 0] / p[:, 2] + 160.0,
                         250.0 * p[:, 1] / p[:, 2] + 120.0], -1)

    d = np.linalg.norm(proj(R_est, t_est) - proj(R_gt, t_gt), axis=-1)
    return float(np.mean(d))


def test_align_points_only_converges(rng):
    scene, pose_ref, pose_cur, img_ref, img_cur = setup_pair(rng)
    Rg, tg = T_cur_from_ref(*pose_ref, *pose_cur)
    pts = ref_points(scene, pose_ref, img_ref)
    assert int(np.asarray(pts.valid).sum()) > 30
    res = sparse_align.sparse_img_align(
        build_pyramid(img_ref, 5), build_pyramid(img_cur, 5),
        pts, empty_segments(),
        jnp.eye(3), jnp.zeros(3), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
        levels=(4, 3, 2), n_iter=30)
    ang, dist = pose_err(res.R, res.t, Rg, tg)
    # initial error was |dt| ~ 0.024 m / ~0.011 rad; the reference stops at
    # klt_min_level=2, so ~0.2 level-2-px of photometric noise floor remains
    assert dist < 0.010, f"translation error {dist}"
    assert ang < 0.004, f"rotation error {ang}"
    assert int(res.n_tracked_pts) > 30


def test_align_with_segments_converges(rng):
    from plsvo_tpu.ops import lines as lineops

    scene, pose_ref, pose_cur, img_ref, img_cur = setup_pair(rng)
    Rg, tg = T_cur_from_ref(*pose_ref, *pose_cur)
    pts = ref_points(scene, pose_ref, img_ref)

    segs_det = lineops.detect_segments(img_ref, n_peaks=32)
    table, _ = lineops.dedup_segments_grid(
        segs_det, width=320, height=240, cell_size=25, max_segs=16, min_length=30.0)
    sp = np.asarray(table.sp)
    ep = np.asarray(table.ep)
    sv = np.asarray(table.valid)
    R_ref, t_ref = pose_ref

    def rng_depth(uv):
        rays = np.asarray(CAM.unproject(jnp.asarray(uv, jnp.float32)))
        z = np.asarray(synthetic.depth_at(
            scene, CAM, jnp.asarray(R_ref), jnp.asarray(t_ref), jnp.asarray(uv, jnp.float32)))
        return rays, z / rays[:, 2]

    s_rays, s_d = rng_depth(sp)
    e_rays, e_d = rng_depth(ep)
    sv = sv & np.isfinite(s_d) & np.isfinite(e_d)
    segs = sparse_align.make_align_segments(
        jnp.asarray(sp, jnp.float32), jnp.asarray(ep, jnp.float32),
        jnp.asarray(s_rays, jnp.float32), jnp.asarray(e_rays, jnp.float32),
        jnp.asarray(s_d, jnp.float32), jnp.asarray(e_d, jnp.float32),
        jnp.asarray(sv), n_samples=4, fx=CAM.fx, fy=CAM.fy, cx=CAM.cx, cy=CAM.cy)
    assert int(np.asarray(sv).sum()) >= 2

    res = sparse_align.sparse_img_align(
        build_pyramid(img_ref, 5), build_pyramid(img_cur, 5),
        pts, segs,
        jnp.eye(3), jnp.zeros(3), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
        levels=(4, 3, 2), n_iter=30)
    ang, dist = pose_err(res.R, res.t, Rg, tg)
    assert dist < 0.008, f"translation error {dist}"
    assert ang < 0.004, f"rotation error {ang}"
    # well-modelled lines must survive the 200-intensity drop gate
    assert int(res.n_tracked_segs) >= 1


def test_align_segments_only(rng):
    """Line-only mode (reference has_pt=false analogue). Parallel close-by
    edges alias at coarse pyramid levels (the bars' two edges are ~1px apart
    at level 4), so line-only tracking starts at level 3 with a small motion
    — the same basin limitation applies to the reference's has_pt=false
    mode."""
    scene, pose_ref, pose_cur, img_ref, img_cur = setup_pair(rng, dt=(0.006, 0.003, 0.0), drot=0.003)
    Rg, tg = T_cur_from_ref(*pose_ref, *pose_cur)
    from plsvo_tpu.ops import lines as lineops

    segs_det = lineops.detect_segments(img_ref, n_peaks=48)
    table, _ = lineops.dedup_segments_grid(
        segs_det, width=320, height=240, cell_size=25, max_segs=24, min_length=25.0)
    sp, ep, sv = np.asarray(table.sp), np.asarray(table.ep), np.asarray(table.valid)
    R_ref, t_ref = pose_ref
    rays_s = np.asarray(CAM.unproject(jnp.asarray(sp, jnp.float32)))
    rays_e = np.asarray(CAM.unproject(jnp.asarray(ep, jnp.float32)))
    zs = np.asarray(synthetic.depth_at(scene, CAM, jnp.asarray(R_ref), jnp.asarray(t_ref), jnp.asarray(sp, jnp.float32)))
    ze = np.asarray(synthetic.depth_at(scene, CAM, jnp.asarray(R_ref), jnp.asarray(t_ref), jnp.asarray(ep, jnp.float32)))
    segs = sparse_align.make_align_segments(
        jnp.asarray(sp, jnp.float32), jnp.asarray(ep, jnp.float32),
        jnp.asarray(rays_s, jnp.float32), jnp.asarray(rays_e, jnp.float32),
        jnp.asarray(zs / rays_s[:, 2], jnp.float32), jnp.asarray(ze / rays_e[:, 2], jnp.float32),
        jnp.asarray(sv & np.isfinite(zs) & np.isfinite(ze)), n_samples=6,
        fx=CAM.fx, fy=CAM.fy, cx=CAM.cx, cy=CAM.cy)

    N = 16
    pts = sparse_align.AlignPoints(
        xyz_ref=jnp.zeros((N, 3), jnp.float32),
        uv_ref=jnp.zeros((N, 2), jnp.float32),
        valid=jnp.zeros((N,), bool))
    res = sparse_align.sparse_img_align(
        build_pyramid(img_ref, 5), build_pyramid(img_cur, 5),
        pts, segs, jnp.eye(3), jnp.zeros(3), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
        levels=(2,), n_iter=40)
    err0 = reproj_err_px(np.eye(3), np.zeros(3), Rg, tg, np.asarray(segs.xyz_ref))
    err = reproj_err_px(res.R, res.t, Rg, tg, np.asarray(segs.xyz_ref))
    # single-level (level 2) alignment noise floor. With length-adaptive
    # sampling (setupSampling parity) short segments carry 2-4 samples at
    # level 2 instead of the former fixed 6, raising this line-ONLY
    # single-level stress floor from ~0.50 to ~0.68 level-0 px (measured;
    # forcing n_act=K reproduces 0.497) while the e2e golden ATE with
    # points+lines IMPROVES (test_pipeline_ate). The reference samples even
    # sparser (len/(2*patch*corr), feature.cpp:160-173). Full-pyramid
    # precision is asserted separately at ~0.1 px below.
    assert err < 0.75, f"reprojection error {err}px (initial {err0}px)"
    assert err < 0.5 * err0


def test_align_full_pyramid_high_precision(rng):
    """Down to level 0 the photometric optimum is ~0.1 px — validates there
    is no systematic bias in warp/jacobian/robust-weight math."""
    scene, pose_ref, pose_cur, img_ref, img_cur = setup_pair(rng)
    Rg, tg = T_cur_from_ref(*pose_ref, *pose_cur)
    pts = ref_points(scene, pose_ref, img_ref)
    res = sparse_align.sparse_img_align(
        build_pyramid(img_ref, 5), build_pyramid(img_cur, 5),
        pts, empty_segments(),
        jnp.eye(3), jnp.zeros(3), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
        levels=(4, 3, 2, 1, 0), n_iter=30)
    ang, dist = pose_err(res.R, res.t, Rg, tg)
    assert dist < 0.0015, f"translation error {dist}"
    assert ang < 0.0008, f"rotation error {ang}"


def test_jacobian_finite_difference(rng):
    """jacobian_xyz2uv is -d proj(exp(xi) p)/d xi at xi=0 (ref sign convention)."""
    p = jnp.asarray([0.3, -0.2, 2.0])
    J = np.asarray(sparse_align.jacobian_xyz2uv(p))

    def proj(xi):
        R, t = lie.se3_exp(jnp.asarray(xi, jnp.float32))
        q = R @ p + t
        return np.asarray(q[:2] / q[2])

    eps = 1e-4
    J_fd = np.zeros((2, 6))
    for k in range(6):
        d = np.zeros(6)
        d[k] = eps
        J_fd[:, k] = (proj(d) - proj(-d)) / (2 * eps)
    np.testing.assert_allclose(J, -J_fd, atol=1e-3)
