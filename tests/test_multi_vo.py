"""Batched multi-sequence runner (BASELINE config 4): tracking B sequences
through the vmapped fused core must match tracking them individually."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plsvo_tpu.camera import PinholeCamera
from plsvo_tpu.config import fast_config
from plsvo_tpu.parallel.multi_vo import BatchedVO
from plsvo_tpu.pipeline.frame_handler import STAGE_DEFAULT, FrameHandlerMono
from plsvo_tpu.utils import synthetic

CAM = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)


def make_sequences(rng, B=2, n_frames=18):
    seqs = []
    for b in range(B):
        scene = synthetic.make_scene(rng, size=1024)
        imgs = []
        for i in range(n_frames):
            R = np.eye(3, dtype=np.float32)
            t = np.asarray([0.025 * i, 0.004 * b * i, -2.0], np.float32)
            img, _ = synthetic.render_aa(scene, CAM, jnp.asarray(R), jnp.asarray(t))
            imgs.append(np.asarray(img))
        seqs.append(imgs)
    return seqs


def test_batched_vo_matches_individual(rng):
    seqs = make_sequences(rng, B=2)
    n_frames = len(seqs[0])

    solo = [FrameHandlerMono(CAM, fast_config()) for _ in range(2)]
    solo_results = [[], []]
    for i in range(n_frames):
        for b in range(2):
            solo_results[b].append(solo[b].add_image(seqs[b][i], i / 30.0))

    bvo = BatchedVO(CAM, fast_config(), 2, mode="vmap")
    batch_results = [[], []]
    for i in range(n_frames):
        rs = bvo.add_images([seqs[0][i], seqs[1][i]], i / 30.0)
        for b in range(2):
            batch_results[b].append(rs[b])

    # both must reach DEFAULT and track
    assert all(vo.stage == STAGE_DEFAULT for vo in bvo.vos)
    for b in range(2):
        for rs_s, rs_b in zip(solo_results[b], batch_results[b]):
            assert rs_s.stage == rs_b.stage
            np.testing.assert_allclose(rs_b.t_f_w, rs_s.t_f_w, atol=1e-4)
            np.testing.assert_allclose(rs_b.R_f_w, rs_s.R_f_w, atol=1e-4)


def test_batched_vo_pipelined_matches_sync(rng):
    """Pipelined batched execution (device-chained steps, burst fetches,
    deferred KF seed detection) tracks the same frames to the same poses
    (within the structure-opt/seed-spawn lag tolerance of pipelining)."""
    import dataclasses

    seqs = make_sequences(rng, B=2)
    n_frames = len(seqs[0])
    cfg = fast_config()

    bvo_s = BatchedVO(CAM, cfg, 2, mode="vmap")
    sync_res = [[], []]
    for i in range(n_frames):
        rs = bvo_s.add_images([seqs[0][i], seqs[1][i]], i / 30.0)
        for b in range(2):
            if rs[b] is not None:
                sync_res[b].append(rs[b])

    cfg_p = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(
            cfg.pipeline, pipelined=True, pipeline_depth=3))
    bvo_p = BatchedVO(CAM, cfg_p, 2, mode="vmap")
    pipe_res = [[], []]
    for i in range(n_frames):
        rs = bvo_p.add_images([seqs[0][i], seqs[1][i]], i / 30.0)
        for b in range(2):
            if rs[b] is not None:
                pipe_res[b].append(rs[b])
    for rs in bvo_p.flush():
        for b in range(2):
            if rs[b] is not None:
                pipe_res[b].append(rs[b])

    assert all(vo.stage == STAGE_DEFAULT for vo in bvo_p.vos)
    for b in range(2):
        ids_s = [r.frame_id for r in sync_res[b] if r.stage == STAGE_DEFAULT]
        ids_p = [r.frame_id for r in pipe_res[b] if r.stage == STAGE_DEFAULT]
        assert ids_p == ids_s
        # same trajectory regime: compare final translations
        rf_s = sync_res[b][-1]
        rf_p = [r for r in pipe_res[b] if r.frame_id == rf_s.frame_id][0]
        np.testing.assert_allclose(rf_p.t_f_w, rf_s.t_f_w, atol=5e-3)


def test_batched_vo_streams_mode(rng):
    """streams mode = B independent pipelined handlers (the single-chip
    serving path): every frame of every stream is delivered exactly once,
    and poses match the individual handlers."""
    import dataclasses

    seqs = make_sequences(rng, B=2, n_frames=16)
    cfg = fast_config()
    solo = [FrameHandlerMono(CAM, cfg) for _ in range(2)]
    for i in range(len(seqs[0])):
        for b in range(2):
            solo[b].add_image(seqs[b][i], i / 30.0)

    cfg_p = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(
            cfg.pipeline, pipelined=True, pipeline_depth=3))
    # r5: auto resolves to the vmapped mode (fastest measured AND the
    # mesh path) — request streams explicitly to test it
    bvo = BatchedVO(CAM, cfg_p, 2, mode="streams")
    assert bvo.mode == "streams"
    got = [[], []]
    for i in range(len(seqs[0])):
        rs = bvo.add_images([seqs[0][i], seqs[1][i]], i / 30.0)
        for b in range(2):
            if rs[b] is not None:
                got[b].append(rs[b])
    for rs in bvo.flush():
        for b in range(2):
            if rs[b] is not None:
                got[b].append(rs[b])
    for b in range(2):
        ids_solo = [r.frame_id for r in solo[b].results
                    if r.stage == STAGE_DEFAULT]
        ids_got = [r.frame_id for r in got[b] if r.stage == STAGE_DEFAULT]
        assert ids_got == ids_solo
        rl_s = solo[b].results[-1]
        rl_g = [r for r in got[b] if r.frame_id == rl_s.frame_id][0]
        np.testing.assert_allclose(rl_g.t_f_w, rl_s.t_f_w, atol=5e-3)


def test_batched_vo_sharded_over_mesh(rng):
    seqs = make_sequences(rng, B=2, n_frames=16)
    devices = jax.devices()
    mesh = jax.sharding.Mesh(np.asarray(devices[:2]), ("seq",))
    bvo = BatchedVO(CAM, fast_config(), 2, mesh=mesh)
    for i in range(len(seqs[0])):
        rs = bvo.add_images([seqs[0][i], seqs[1][i]], i / 30.0)
    assert all(vo.stage == STAGE_DEFAULT for vo in bvo.vos)
    assert all(r is not None for r in rs)
    assert min(r.n_pt_matches for r in rs) > 20
