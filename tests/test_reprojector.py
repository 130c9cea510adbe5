"""Reprojector per-cell retry (reference: refineBestCandidate retries the
next-best candidate in a cell after a failed refinement until one match per
cell, reprojector.cpp:236-276 — VERDICT r3 missing #5)."""
import jax.numpy as jnp
import numpy as np

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.image import build_pyramid
from plsvo_tpu.pipeline import reprojector
from plsvo_tpu.utils import synthetic

CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)


def _setup(rng, occlude: bool):
    """One keyframe, one (identical-pose) current frame; TWO landmarks in
    the same 32px grid cell — the better-quality one occluded in the
    current image."""
    scene = synthetic.make_scene(rng, size=1024, texel_size=0.004)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, -2.0], np.float32)
    img, _ = synthetic.render_aa(scene, CAM, R, t)
    img_ref = np.asarray(img)
    img_cur = img_ref.copy()
    uvA = np.array([100.0, 100.0], np.float32)  # status GOOD -> cell winner
    uvB = np.array([118.0, 118.0], np.float32)  # status UNKNOWN -> runner-up
    if occlude:
        img_cur[88:112, 88:112] = 0.0  # flat square over A's patch only

    n_levels = 3
    pyr_ref = build_pyramid(jnp.asarray(img_ref), n_levels)
    pyr_cur = build_pyramid(jnp.asarray(img_cur), n_levels)
    kf_stack = [p[None] for p in pyr_ref]  # K=1

    P, O = 4, 2
    uv = np.zeros((P, 2), np.float32)
    uv[0], uv[1] = uvA, uvB
    rays = np.asarray(CAM.unproject(jnp.asarray(uv[:2])))
    z = np.asarray(synthetic.depth_at(scene, CAM, jnp.asarray(R),
                                      jnp.asarray(t), jnp.asarray(uv[:2])))
    rng_d = z / rays[:, 2]
    pos_cam = rays * rng_d[:, None]
    pos_w = (R.T @ (pos_cam - t[None]).T).T  # world coords

    pt_pos = np.zeros((P, 3), np.float32)
    pt_pos[:2] = pos_w
    pt_status = np.zeros(P, np.int8)
    pt_status[0] = 2  # GOOD wins the cell
    pt_status[1] = 1  # UNKNOWN is the runner-up
    pt_anchor_kf = np.full(P, -1, np.int32)
    pt_anchor_kf[:2] = 0
    pt_anchor_uv = uv
    pt_anchor_f = np.zeros((P, 3), np.float32)
    pt_anchor_f[:2] = rays
    pt_anchor_level = np.zeros(P, np.int32)
    pt_obs_kf = np.full((P, O), -1, np.int32)
    pt_obs_uv = np.zeros((P, O, 2), np.float32)
    pt_obs_f = np.zeros((P, O, 3), np.float32)
    pt_obs_level = np.zeros((P, O), np.int32)
    kf_R = R[None]
    kf_t = t[None]
    args = (jnp.asarray(pt_pos), jnp.asarray(pt_status),
            jnp.asarray(pt_anchor_kf), jnp.asarray(pt_anchor_uv),
            jnp.asarray(pt_anchor_f), jnp.asarray(pt_anchor_level),
            jnp.asarray(pt_obs_kf), jnp.asarray(pt_obs_uv),
            jnp.asarray(pt_obs_f), jnp.asarray(pt_obs_level),
            jnp.asarray(kf_R), jnp.asarray(kf_t), kf_stack, pyr_cur,
            jnp.asarray(R), jnp.asarray(t),
            CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    return args, uvB


def test_retry_recovers_occluded_cell(rng):
    args, uvB = _setup(rng, occlude=True)
    res0 = reprojector.reproject_points(*args, cell_size=32, max_out=32,
                                        retry=False)
    # the cell's best-quality candidate is occluded -> no match at all
    assert int(res0.n_matches) == 0, int(res0.n_matches)

    res1 = reprojector.reproject_points(*args, cell_size=32, max_out=32,
                                        retry=True)
    # retry refines the runner-up (landmark row 1) and recovers the cell
    assert int(res1.n_matches) == 1, int(res1.n_matches)
    m = np.asarray(res1.matched)
    assert np.asarray(res1.lm_idx)[m][0] == 1
    err = np.linalg.norm(np.asarray(res1.uv)[m][0] - uvB)
    assert err < 0.5, err


def test_retry_noop_when_first_round_matches(rng):
    """Unoccluded: the winner refines, retry adds nothing (runner-up stays
    unattempted — one match per cell like the reference)."""
    args, _ = _setup(rng, occlude=False)
    res = reprojector.reproject_points(*args, cell_size=32, max_out=32,
                                       retry=True)
    assert int(res.n_matches) == 1
    m = np.asarray(res.matched)
    assert np.asarray(res.lm_idx)[m][0] == 0  # the GOOD landmark won
