import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plsvo_tpu import lie
from plsvo_tpu.parallel import ba


def make_problem(rng, K=4, L=64, O=6, noise_px=0.15, pose_noise=0.01,
                 lm_noise=0.15, n_fixed=2, focal=250.0):
    # lm_noise must exceed the triangulation noise floor (~z^2*sigma_ang/b)
    # or BA correctly moves landmarks AWAY from the synthetic GT
    """Synthetic BA problem with GT, noisy initialization."""
    # ground-truth poses along a small baseline
    R_gt, t_gt = [], []
    for k in range(K):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.12 * k
        xi[1] = 0.02 * np.sin(k)
        xi[4] = 0.02 * k
        R, t = lie.se3_exp(jnp.asarray(xi))
        R_gt.append(np.asarray(R))
        t_gt.append(np.asarray(t))
    R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)

    pos_gt = np.stack([
        rng.uniform(-1.2, 1.2, L), rng.uniform(-1.0, 1.0, L),
        rng.uniform(2.5, 5.0, L)], -1).astype(np.float32)

    obs_kf = np.tile(np.arange(O, dtype=np.int32)[None] % K, (L, 1))
    obs_f = np.zeros((L, O, 3), np.float32)
    obs_valid = np.zeros((L, O), bool)
    for l in range(L):
        for o in range(O):
            k = obs_kf[l, o]
            xyz = R_gt[k] @ pos_gt[l] + t_gt[k]
            if xyz[2] < 0.2:
                continue
            f = xyz / np.linalg.norm(xyz)
            f[:2] += rng.normal(0, noise_px / focal, 2)
            obs_f[l, o] = f / np.linalg.norm(f)
            obs_valid[l, o] = True

    # noisy initialization (fixed poses stay at GT)
    R0, t0 = R_gt.copy(), t_gt.copy()
    for k in range(n_fixed, K):
        dxi = rng.normal(0, pose_noise, 6).astype(np.float32)
        dR, dt = lie.se3_exp(jnp.asarray(dxi))
        Rn, tn = lie.compose(dR, dt, jnp.asarray(R_gt[k]), jnp.asarray(t_gt[k]))
        R0[k], t0[k] = np.asarray(Rn), np.asarray(tn)
    pos0 = pos_gt + rng.normal(0, lm_noise, pos_gt.shape).astype(np.float32)

    fixed = np.zeros(K, bool)
    fixed[:n_fixed] = True
    prob = ba.BAProblem(
        kf_R=jnp.asarray(R0), kf_t=jnp.asarray(t0), kf_fixed=jnp.asarray(fixed),
        lm_pos=jnp.asarray(pos0), lm_valid=jnp.ones(L, bool),
        obs_kf=jnp.asarray(obs_kf), obs_f=jnp.asarray(obs_f),
        obs_valid=jnp.asarray(obs_valid))
    return prob, (R_gt, t_gt, pos_gt)


def pose_errors(prob, R_gt, t_gt):
    ang, dist = lie.distance(prob.kf_R, prob.kf_t,
                             jnp.asarray(R_gt), jnp.asarray(t_gt))
    return np.asarray(ang), np.asarray(dist)


def test_ba_reduces_chi2_and_pose_error(rng):
    prob, (R_gt, t_gt, pos_gt) = make_problem(rng)
    _, _, _, _, _, chi2_0, n_obs = ba._assemble_shard(prob, 1.0 / 250.0, 1e-8)
    out, stats = ba.bundle_adjust(prob, n_iter=8)
    assert float(stats.chi2) < 0.2 * float(chi2_0)
    ang0, dist0 = pose_errors(prob, R_gt, t_gt)
    ang1, dist1 = pose_errors(out, R_gt, t_gt)
    assert dist1[2:].max() < 0.35 * dist0[2:].max(), (dist0, dist1)
    lm_err0 = np.linalg.norm(np.asarray(prob.lm_pos) - pos_gt, axis=-1)
    lm_err1 = np.linalg.norm(np.asarray(out.lm_pos) - pos_gt, axis=-1)
    assert np.median(lm_err1) < 0.35 * np.median(lm_err0)


def test_ba_fixed_poses_stay_fixed(rng):
    prob, (R_gt, t_gt, pos_gt) = make_problem(rng)
    out, _ = ba.bundle_adjust(prob, n_iter=5)
    np.testing.assert_allclose(np.asarray(out.kf_R[:2]), np.asarray(prob.kf_R[:2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.kf_t[:2]), np.asarray(prob.kf_t[:2]), atol=1e-6)


def test_ba_sharded_matches_single(rng):
    """One iteration must agree to f32 reduction tolerance; over many
    accept-gated iterations float reduction order diverges chaotically, so
    multi-iteration equivalence is asserted via convergence quality."""
    prob, gt = make_problem(rng, L=64)
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual devices"
    mesh = jax.sharding.Mesh(np.asarray(devices[:8]), ("ba",))

    out_s1, _ = ba.bundle_adjust_sharded(prob, mesh, "ba", n_iter=1)
    out_11, _ = ba.bundle_adjust(prob, n_iter=1)
    np.testing.assert_allclose(np.asarray(out_s1.kf_t), np.asarray(out_11.kf_t),
                               atol=5e-4)
    # landmark back-substitution amplifies dc reduction noise along the
    # weakly-constrained depth direction (Hpp^-1 is ill-conditioned there)
    np.testing.assert_allclose(np.asarray(out_s1.lm_pos), np.asarray(out_11.lm_pos),
                               atol=5e-3)

    _, _, _, _, _, chi2_0, _ = ba._assemble_shard(prob, 1.0 / 250.0, 1e-8)
    out_s, stats_s = ba.bundle_adjust_sharded(prob, mesh, "ba", n_iter=8)
    assert float(stats_s.chi2) < 0.2 * float(chi2_0)
    out_1, stats_1 = ba.bundle_adjust(prob, n_iter=8)
    assert int(stats_s.n_obs) == int(stats_1.n_obs)
    # both converge to comparably good optima
    assert float(stats_s.chi2) < 2.0 * float(stats_1.chi2)


def make_line_problem(rng, K=4, S=24, O=4, shrink=0.25, pose_noise=0.01,
                      ep_noise=0.08, noise_px=0.3, focal=250.0):
    """Synthetic line-segment BA problem: S segments -> 2S endpoint rows
    (s rows then e rows) sharing per-observation line coefficients.

    Observed endpoints SHRINK toward the segment center by up to `shrink`
    per observation (random extent, like partial occlusion/misdetection) —
    which displaces observations ALONG the line while leaving the observed
    infinite line itself unchanged. The point-to-line model must therefore
    be invariant to it; the independent-endpoint model is pulled by it."""
    R_gt, t_gt = [], []
    for k in range(K):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.12 * k
        xi[1] = 0.02 * np.sin(k)
        xi[4] = 0.02 * k
        R, t = lie.se3_exp(jnp.asarray(xi))
        R_gt.append(np.asarray(R))
        t_gt.append(np.asarray(t))
    R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)

    s_gt = np.stack([
        rng.uniform(-1.0, 1.0, S), rng.uniform(-0.8, 0.8, S),
        rng.uniform(2.5, 5.0, S)], -1).astype(np.float32)
    d = rng.normal(size=(S, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    e_gt = s_gt + d * rng.uniform(0.5, 1.2, (S, 1)).astype(np.float32)

    L = 2 * S
    obs_kf = np.tile(np.arange(O, dtype=np.int32)[None] % K, (L, 1))
    obs_f = np.zeros((L, O, 3), np.float32)
    obs_line = np.zeros((L, O, 3), np.float32)
    obs_valid = np.zeros((L, O), bool)
    for l in range(S):
        for o in range(O):
            k = obs_kf[l, o]
            xs = R_gt[k] @ s_gt[l] + t_gt[k]
            xe = R_gt[k] @ e_gt[l] + t_gt[k]
            if xs[2] < 0.2 or xe[2] < 0.2:
                continue
            ps = xs[:2] / xs[2]
            pe = xe[:2] / xe[2]
            # random extent loss along the segment + small detector noise
            a_s = shrink * rng.uniform(0, 1)
            a_e = shrink * rng.uniform(0, 1)
            qs = ps + a_s * (pe - ps) + rng.normal(0, noise_px / focal, 2)
            qe = pe + a_e * (ps - pe) + rng.normal(0, noise_px / focal, 2)
            hs = np.asarray([qs[0], qs[1], 1.0])
            he = np.asarray([qe[0], qe[1], 1.0])
            line = np.cross(hs, he)
            line /= max(np.linalg.norm(line[:2]), 1e-12)
            for row, h in ((l, hs), (S + l, he)):
                obs_f[row, o] = h / np.linalg.norm(h)
                obs_line[row, o] = line
                obs_valid[row, o] = True

    R0, t0 = R_gt.copy(), t_gt.copy()
    for k in range(2, K):
        dxi = rng.normal(0, pose_noise, 6).astype(np.float32)
        dR, dt = lie.se3_exp(jnp.asarray(dxi))
        Rn, tn = lie.compose(dR, dt, jnp.asarray(R_gt[k]),
                             jnp.asarray(t_gt[k]))
        R0[k], t0[k] = np.asarray(Rn), np.asarray(tn)
    pos_gt = np.concatenate([s_gt, e_gt], 0)
    pos0 = pos_gt + rng.normal(0, ep_noise, pos_gt.shape).astype(np.float32)

    fixed = np.zeros(K, bool)
    fixed[:2] = True
    prob = ba.BAProblem(
        kf_R=jnp.asarray(R0), kf_t=jnp.asarray(t0),
        kf_fixed=jnp.asarray(fixed),
        lm_pos=jnp.asarray(pos0), lm_valid=jnp.ones(L, bool),
        obs_kf=jnp.asarray(obs_kf), obs_f=jnp.asarray(obs_f),
        obs_valid=jnp.asarray(obs_valid),
        obs_line=jnp.asarray(obs_line),
        lm_dir=jnp.asarray(np.concatenate([d, d], 0)))
    return prob, (R_gt, t_gt, s_gt, e_gt)


def _point_line_dist(p, a, b):
    """Distance of points p (N,3) to infinite 3D lines through a->b."""
    d = b - a
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    v = p - a
    return np.linalg.norm(v - (v * d).sum(-1, keepdims=True) * d, axis=-1)


def test_ba_line_residual_converges(rng):
    """Point-to-infinite-line residuals (pose_optimizer.cpp:132-167 model)
    pull endpoints onto the GT 3D line and reduce chi2. (O=6 views and
    0.1px noise: at O=4/0.3px the perpendicular depth-noise floor
    ~z^2/b*sigma is already ~75% of the initial endpoint noise.)"""
    prob, (R_gt, t_gt, s_gt, e_gt) = make_line_problem(rng, O=6,
                                                       noise_px=0.1)
    S = len(s_gt)
    _, _, _, _, _, chi2_0, n_obs = ba._assemble_shard(prob, 1.0 / 250.0,
                                                      1e-8)
    assert int(n_obs) > 0
    out, stats = ba.bundle_adjust(prob, n_iter=8)
    assert float(stats.chi2) < 0.2 * float(chi2_0)
    pos0 = np.asarray(prob.lm_pos)
    pos1 = np.asarray(out.lm_pos)
    d0 = np.concatenate([_point_line_dist(pos0[:S], s_gt, e_gt),
                         _point_line_dist(pos0[S:], s_gt, e_gt)])
    d1 = np.concatenate([_point_line_dist(pos1[:S], s_gt, e_gt),
                         _point_line_dist(pos1[S:], s_gt, e_gt)])
    assert np.median(d1) < 0.35 * np.median(d0), (np.median(d0),
                                                  np.median(d1))


def test_ba_line_model_preserves_segment_extent(rng):
    """VERDICT r3 #4 'done' criterion: BA must no longer stretch/shrink
    segments. Observations lose up to 25% extent per view; the line model
    (zero along-line gradient) keeps endpoint separation ~unchanged, while
    the independent-endpoint model shrinks it toward the observed extents."""
    prob, (R_gt, t_gt, s_gt, e_gt) = make_line_problem(rng)
    S = len(s_gt)

    def lengths(pos):
        pos = np.asarray(pos)
        return np.linalg.norm(pos[:S] - pos[S:], axis=-1)

    len0 = lengths(prob.lm_pos)
    out_line, _ = ba.bundle_adjust(prob, n_iter=8)
    drift_line = np.abs(lengths(out_line.lm_pos) - len0) / len0

    prob_pt = prob._replace(obs_line=None)  # r3 independent-endpoint model
    out_pt, _ = ba.bundle_adjust(prob_pt, n_iter=8)
    drift_pt = np.abs(lengths(out_pt.lm_pos) - len0) / len0

    # line model: bounded drift (perpendicular corrections only)
    assert np.median(drift_line) < 0.03, np.median(drift_line)
    # and categorically less extent distortion than the endpoint model,
    # which chases the shrunken observed endpoints
    assert np.median(drift_line) < 0.5 * np.median(drift_pt), (
        np.median(drift_line), np.median(drift_pt))


def test_ba_line_sharded_matches_single(rng):
    """The sharded path must carry obs_line identically."""
    prob, _ = make_line_problem(rng, S=24)  # 48 rows / 8 devices
    devices = jax.devices()
    mesh = jax.sharding.Mesh(np.asarray(devices[:8]), ("ba",))
    out_s, _ = ba.bundle_adjust_sharded(prob, mesh, "ba", n_iter=1)
    out_1, _ = ba.bundle_adjust(prob, n_iter=1)
    np.testing.assert_allclose(np.asarray(out_s.kf_t),
                               np.asarray(out_1.kf_t), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_s.lm_pos),
                               np.asarray(out_1.lm_pos), atol=5e-3)


def test_ba_from_map_roundtrip(rng):
    """problem_from_map / write_back_to_map preserve structure."""
    from plsvo_tpu.config import fast_config
    from plsvo_tpu.pipeline.state import MapState, FrameState, ST_GOOD

    cfg = fast_config()
    m = MapState(cfg, 3, (240, 320))
    fr = FrameState.empty(cfg, 0, 0.0,
                          [jnp.zeros((240 >> l, 320 >> l)) for l in range(3)],
                          np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    slot = m.add_keyframe(fr)
    for i in range(5):
        r = m.new_point(rng.normal(size=3), slot, np.zeros(2),
                        np.asarray([0, 0, 1.0]), 0, status=ST_GOOD)
        assert r >= 0
    r = m.new_line(rng.normal(size=3), rng.normal(size=3), slot,
                   np.zeros(2), np.ones(2), np.asarray([0, 0, 1.0]),
                   np.asarray([0, 0, 1.0]), 0, status=ST_GOOD)
    assert r >= 0
    prob, meta = ba.problem_from_map(m, cfg)
    assert prob.lm_pos.shape[0] == 5 + 2
    assert meta["n_points"] == 5 and meta["n_lines"] == 1
    pos_before = m.pt_pos.copy()
    ba.write_back_to_map(m, prob, meta)
    np.testing.assert_allclose(m.pt_pos, pos_before)
