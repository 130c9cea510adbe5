"""Windowed local BA: window selection, fixed flags, padding buckets, and
the guarded deferred write-back (reference intent ba::localBA,
src/bundle_adjustment.cpp:124-255 — dead code there, live here)."""
import numpy as np
import pytest

from plsvo_tpu.config import Config
from plsvo_tpu.pipeline.state import MapState, ST_GOOD, ST_UNKNOWN, ST_DELETED
from plsvo_tpu.parallel import ba


def _small_map():
    cfg = Config()
    m = MapState(cfg, 3, (64, 64), intrinsics=(100.0, 100.0, 32.0, 32.0))
    # 4 keyframes, slots 0..3
    for k in range(4):
        m.kf_occupied[k] = True
        m.kf_frame_id[k] = 10 + k
        m.kf_t[k] = [0.1 * k, 0, 0]
    # landmarks: row 0 observed by core KF 2; row 1 only by KF 0 (outside);
    # row 2 deleted
    for r, kf_list in [(0, [2, 3]), (1, [0, 1]), (2, [2])]:
        m.pt_status[r] = ST_GOOD
        m.pt_pos[r] = [0.1 * r, 0.2, 3.0]
        m.pt_anchor_kf[r] = kf_list[0]
        for o, k in enumerate(kf_list):
            m.pt_obs_kf[r, o] = k
            f = m.pt_pos[r] + [0, 0, 0.01]
            m.pt_obs_f[r, o] = f / np.linalg.norm(f)
    m.pt_status[2] = ST_DELETED
    # one line observed by core KF 3
    m.ln_status[0] = ST_UNKNOWN
    m.ln_spos[0] = [0.0, 0.0, 2.5]
    m.ln_epos[0] = [0.3, 0.0, 2.5]
    m.ln_anchor_kf[0] = 3
    m.ln_obs_kf[0, 0] = 3
    m.ln_obs_sf[0, 0] = [0, 0, 1.0]
    m.ln_obs_ef[0, 0] = [0.12, 0, 0.99]
    return cfg, m


def test_window_selection_and_fixed_flags():
    cfg, m = _small_map()
    prob, meta = ba.problem_from_window(m, cfg, core_slots=[2, 3],
                                        pad_bucket=16)
    # only row 0 (core-observed, alive) among points; line row 0 selected
    assert list(meta["pt_rows"]) == [0]
    assert list(meta["ln_rows"]) == [0]
    # rows padded to the bucket
    assert prob.lm_pos.shape[0] == 16
    assert int(np.sum(np.asarray(prob.lm_valid))) == 3  # pt + 2 endpoints
    fixed = np.asarray(prob.kf_fixed)
    assert fixed[0] and fixed[1]          # outside-window neighbors frozen
    assert not fixed[2] and not fixed[3]  # core free
    assert fixed[4:].all()                # empty slots frozen


def test_window_all_core_gauge_fixes_oldest():
    cfg, m = _small_map()
    prob, meta = ba.problem_from_window(m, cfg, core_slots=[0, 1, 2, 3],
                                        pad_bucket=16)
    fixed = np.asarray(prob.kf_fixed)
    assert fixed[0]                       # oldest (frame_id 10) gauge-fixed
    assert not fixed[1:4].any()


def test_write_back_guards():
    cfg, m = _small_map()
    prob, meta = ba.problem_from_window(m, cfg, core_slots=[2, 3],
                                        pad_bucket=16)
    kf_R = np.asarray(prob.kf_R).copy()
    kf_t = np.asarray(prob.kf_t) + 0.5
    lm = np.asarray(prob.lm_pos) + 0.25

    # between dispatch and completion: KF 3 replaced, point 0 deleted
    m.kf_frame_id[3] = 99
    m.pt_status[0] = ST_DELETED
    n_kf, n_lm = ba.write_back_window(m, kf_R, kf_t, lm, meta)
    assert n_kf == 1          # only KF 2 still matches
    assert n_lm == 1          # only the line survives
    np.testing.assert_allclose(m.kf_t[2], kf_t[2])
    np.testing.assert_allclose(m.kf_t[3], [0.3, 0, 0])  # untouched
    np.testing.assert_allclose(m.pt_pos[0], [0.0, 0.2, 3.0])  # untouched
    np.testing.assert_allclose(m.ln_spos[0], lm[1])


def test_windowed_ba_converges():
    """End-to-end on a synthetic window: noisy core pose is pulled back."""
    import jax.numpy as jnp
    from tests.test_ba import make_problem

    rng = np.random.default_rng(0)
    prob, (R_gt, t_gt, pos_gt) = make_problem(rng, K=4, L=64)
    out, stats = ba.bundle_adjust(prob, n_iter=6)
    from plsvo_tpu import lie
    _, dist0 = lie.distance(prob.kf_R, prob.kf_t,
                            jnp.asarray(R_gt), jnp.asarray(t_gt))
    _, dist1 = lie.distance(out.kf_R, out.kf_t,
                            jnp.asarray(R_gt), jnp.asarray(t_gt))
    assert float(np.max(np.asarray(dist1)[2:])) < \
        0.5 * float(np.max(np.asarray(dist0)[2:]))
