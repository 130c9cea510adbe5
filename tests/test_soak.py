"""Long-sequence soak (VERDICT r4 next #5): 300+ frames on an orbit that
cycles the keyframe ring several times, with a mid-sequence blackout that
forces relocalization. Asserts bounded ATE drift, recovery, no
landmark-table leak (free-list exhaustion), and map consistency — the
slow map-state corruption the ~28-frame goldens cannot see.

Reference analogues: KF-limit eviction frame_handler_mono.cpp:394-399,
seed aging depth_filter.cpp:289-292, relocalization :408-436; the
reference's own sequences run minutes (app/run_pipeline.cpp:707-710).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import fast_config
from plsvo_tpu.pipeline.frame_handler import (
    STAGE_DEFAULT, STAGE_RELOCALIZING, FrameHandlerMono)
from plsvo_tpu.pipeline.state import validate_map
from plsvo_tpu.utils import synthetic, trajectory

CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)
N_FRAMES = 310
BLACKOUT = range(150, 153)  # 3 dropped frames -> tracking failure


def _orbit_pose(i: int):
    """Camera arcs above the plane (radius 1 m, ~1/2 revolution over the
    sequence) with gentle yaw — stays over an 8 m texture forever while
    the motion keeps installing and evicting keyframes."""
    th = 2 * np.pi * i / 900.0
    r = 1.0
    yaw = 0.25 * np.sin(th)  # look-direction wobble
    R = np.asarray(
        [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
         [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    t = np.asarray([r * np.sin(th), 0.3 * r * (np.cos(th) - 1.0), -2.0],
                   np.float32)
    return R, t


@pytest.fixture(scope="module")
def soak_run():
    # seed 7: seed 11's 2048-texture leaves a feature-poor patch exactly
    # where the orbit's first frames look (bootstrap then starts with ~20
    # landmarks and dies) — a texture-statistics artifact, not a pipeline
    # property
    rng = np.random.default_rng(7)
    scene = synthetic.make_scene(rng, size=2048, texel_size=0.004)
    vo = FrameHandlerMono(CAM, fast_config())
    results = []
    gt = []
    live_pt_hwm = []  # live point-landmark high-water marks over time
    black = np.zeros((240, 320), np.float32)
    for i in range(N_FRAMES):
        R, t = _orbit_pose(i)
        if i in BLACKOUT:
            img = black
        else:
            img = np.asarray(synthetic.render_aa(
                scene, CAM, jnp.asarray(R), jnp.asarray(t))[0])
        results.append(vo.add_image(img, i / 30.0))
        gt.append((R, t))
        live_pt_hwm.append(int((vo.map.pt_status > 0).sum()))
    return vo, results, gt, live_pt_hwm


def test_soak_tracks_and_recovers(soak_run):
    vo, results, gt, _ = soak_run
    stages = [r.stage for r in results]
    assert STAGE_DEFAULT in stages
    first_default = stages.index(STAGE_DEFAULT)
    assert first_default < 25  # ~0.7 cm/frame: disparity gate ~frame 20
    # before the blackout: uninterrupted tracking
    assert all(s == STAGE_DEFAULT
               for s in stages[first_default: BLACKOUT[0]])
    # the blackout forces a relocalization...
    assert STAGE_RELOCALIZING in stages[BLACKOUT[0]:], "blackout not felt"
    assert vo.n_relocalizations >= 1
    # ...and tracking RECOVERS: the tail runs in DEFAULT again
    recov = stages[BLACKOUT[-1] + 1:]
    assert STAGE_DEFAULT in recov
    back = recov.index(STAGE_DEFAULT) + BLACKOUT[-1] + 1
    assert back - BLACKOUT[-1] < 20, f"recovery took {back - BLACKOUT[-1]}"
    tail = stages[back:]
    assert tail.count(STAGE_DEFAULT) > 0.9 * len(tail), tail


def test_soak_kf_ring_cycles(soak_run):
    vo, results, _, _ = soak_run
    n_kf_events = sum(r.is_keyframe for r in results)
    cap = vo.cfg.caps.max_kfs
    # the ring (8 slots) filled up and eviction recycled slots repeatedly
    assert n_kf_events >= cap + 2, n_kf_events
    assert vo.map.n_keyframes() <= cap


def test_soak_drift_bounded(soak_run):
    vo, results, gt, _ = soak_run
    # ATE over the final 140 tracked frames (one full revisit arc),
    # Sim3-aligned: catches accumulated map corruption, not just local
    # tracking. Monocular scale drifts over 300 frames; the with_scale
    # alignment keeps this a SHAPE-fidelity bound.
    idx = [i for i, r in enumerate(results[-140:], start=N_FRAMES - 140)
           if r.stage == STAGE_DEFAULT]
    assert len(idx) > 100
    est = np.stack([-results[i].R_f_w.T @ results[i].t_f_w for i in idx])
    gtp = np.stack([gt[i][1] for i in idx])  # t IS the world position here
    ate = trajectory.ate_rmse(est, gtp, with_scale=True)
    # measured 0.0014 on the ~2.2 m arc; ~3x headroom for platform jitter
    assert ate < 0.004, f"soak tail ATE {ate}"


def test_soak_no_table_leaks(soak_run):
    vo, results, _, live_hwm = soak_run
    caps = vo.cfg.caps
    # landmark tables never exhaust their free lists: the high-water mark
    # stays clear of capacity (deletion/eviction keeps recycling rows)
    assert max(live_hwm) < 0.9 * caps.max_points, max(live_hwm)
    assert (vo.map.pt_status == 0).sum() > 0.1 * caps.max_points
    assert (vo.map.ln_status > 0).sum() < 0.9 * caps.max_lines
    # seed tables bounded by aging (depth_filter.cpp:289-292 analogue)
    assert vo._seed_alive.sum() <= caps.max_seeds
    # map invariants hold after ~40 keyframe installs + evictions
    assert validate_map(vo.map) == []
