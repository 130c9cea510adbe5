"""MapState keyframe queries and landmark GC.

Covers the reference's FoV-overlap machinery (Frame::setKeyPoints/
checkKeyPoints, frame.cpp:87-141; Map::getCloseKeyframes/getClosestKeyframe,
map.cpp:158-199) and reference-counting landmark deletion on frame-ref
removal (Map::removePtFrameRef, map.cpp:82-114).
"""
import jax.numpy as jnp
import numpy as np

from plsvo_tpu.config import fast_config
from plsvo_tpu.pipeline.state import (
    MapState, FrameState, ST_DELETED, ST_GOOD)

W, H = 320, 240
FX = FY = 200.0
CX, CY = W / 2.0, H / 2.0


def _frame(cfg, fid, R, t):
    return FrameState.empty(
        cfg, fid, float(fid),
        [jnp.zeros((H >> l, W >> l)) for l in range(3)],
        np.asarray(R, np.float32), np.asarray(t, np.float32))


def _map(cfg):
    return MapState(cfg, 3, (H, W), intrinsics=(FX, FY, CX, CY))


def _rot_y(deg):
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _install_kf_with_points(m, cfg, fid, R, t, pts_w):
    """Add a keyframe whose features observe the given world points."""
    fr = _frame(cfg, fid, R, t)
    slot = m.add_keyframe(fr)
    lms = []
    for p in pts_w:
        xyz = R @ p + t
        uv = np.asarray([FX * xyz[0] / xyz[2] + CX,
                         FY * xyz[1] / xyz[2] + CY], np.float32)
        f = xyz / np.linalg.norm(xyz)
        lms.append(m.new_point(p, slot, uv, f, 0, status=ST_GOOD))
    fr.pt_uv[:len(lms)] = [m.pt_anchor_uv[r] for r in lms]
    fr.pt_lm[:len(lms)] = lms
    fr.pt_valid[:len(lms)] = True
    m._set_key_landmarks(slot, fr)
    return slot, lms


def test_overlap_rejects_backward_facing_kf(rng):
    """A keyframe 10 cm away but facing AWAY must lose to an overlapping
    keyframe further away (VERDICT missing #4; reference map.cpp:158-199)."""
    cfg = fast_config()
    m = _map(cfg)
    # world points ~2 m in front of the origin along +z
    pts = [np.asarray([x, y, 2.0], np.float32)
           for x, y in [(0, 0), (0.5, 0.4), (-0.5, 0.4),
                        (-0.5, -0.4), (0.5, -0.4)]]
    # KF A: 30 cm behind the query, looking +z (overlaps the query view)
    slot_a, _ = _install_kf_with_points(
        m, cfg, 0, np.eye(3, dtype=np.float32),
        np.asarray([0, 0, 0.3], np.float32), pts)
    # KF B: 10 cm from the query but rotated 180deg (faces -z; its key
    # landmarks are BEHIND it — no overlap). Its own points lie at -z.
    pts_b = [np.asarray([x, y, -2.0], np.float32)
             for x, y in [(0, 0), (0.4, 0.3), (-0.4, 0.3),
                          (-0.4, -0.3), (0.4, -0.3)]]
    Rb = _rot_y(180.0)
    tb = (-Rb @ np.asarray([0.1, 0, 0], np.float32)).astype(np.float32)
    slot_b, _ = _install_kf_with_points(m, cfg, 1, Rb, tb, pts_b)

    # query: identity pose looking +z
    Rq = np.eye(3, dtype=np.float32)
    tq = np.zeros(3, np.float32)
    over = m.overlap_kfs(Rq, tq, FX, FY, CX, CY)
    slots = [k for k, _ in over]
    assert slot_a in slots and slot_b not in slots
    # pure distance would pick B (0.1 m < 0.3 m); overlap query picks A
    assert m.closest_kf_slot(np.zeros(3)) == slot_b
    assert m.closest_overlap_kf_slot(Rq, tq, FX, FY, CX, CY) == slot_a


def test_overlap_fallback_when_nothing_visible():
    """Total blackout: no keyframe overlaps -> fall back to distance so
    relocalization still has a target."""
    cfg = fast_config()
    m = _map(cfg)
    pts = [np.asarray([x, y, -2.0], np.float32)
           for x, y in [(0, 0), (0.4, 0.3), (-0.4, 0.3),
                        (-0.4, -0.3), (0.4, -0.3)]]
    Rb = _rot_y(180.0)
    slot, _ = _install_kf_with_points(m, cfg, 0, Rb,
                                      np.zeros(3, np.float32), pts)
    assert m.closest_overlap_kf_slot(
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        FX, FY, CX, CY) == slot


def test_refcount_deletion_and_reanchor():
    """Eviction kills landmarks with <=2 remaining obs and re-anchors
    survivors anchored at the evicted KF (reference map.cpp:82-114)."""
    cfg = fast_config()
    m = _map(cfg)
    slots = []
    for k in range(3):
        fr = _frame(cfg, k, np.eye(3, dtype=np.float32),
                    np.asarray([0, 0, 0.1 * k], np.float32))
        slots.append(m.add_keyframe(fr))
    p = np.asarray([0, 0, 2.0], np.float32)
    f = np.asarray([0, 0, 1.0], np.float32)
    # X: observed only by KF0 -> dies with KF0
    x = m.new_point(p, slots[0], np.asarray([CX, CY]), f, 0, status=ST_GOOD)
    # Y: anchored at KF0 with obs in KF0,1,2 -> survives, re-anchored
    y = m.new_point(p, slots[0], np.asarray([CX, CY]), f, 0, status=ST_GOOD)
    m._add_pt_obs(y, slots[1], f, np.asarray([CX + 1, CY]), 0)
    m._add_pt_obs(y, slots[2], f, np.asarray([CX + 2, CY]), 0)
    # Z: not observed by KF0 at all -> untouched
    z = m.new_point(p, slots[1], np.asarray([CX, CY]), f, 0, status=ST_GOOD)
    m._add_pt_obs(z, slots[2], f, np.asarray([CX, CY]), 0)

    m.remove_keyframe(slots[0])
    assert m.pt_status[x] == ST_DELETED
    assert m.pt_status[y] == ST_GOOD
    assert m.pt_anchor_kf[y] == slots[2]  # most recent surviving obs
    np.testing.assert_allclose(m.pt_anchor_uv[y], [CX + 2, CY])
    assert m.pt_status[z] == ST_GOOD
    assert m.pt_anchor_kf[z] == slots[1]
    # no obs slot still references the evicted keyframe
    assert not (m.pt_obs_kf == slots[0]).any()


def test_refcount_line_deletion_and_reanchor():
    cfg = fast_config()
    m = _map(cfg)
    slots = []
    for k in range(3):
        fr = _frame(cfg, k, np.eye(3, dtype=np.float32),
                    np.asarray([0, 0, 0.1 * k], np.float32))
        slots.append(m.add_keyframe(fr))
    sp = np.asarray([-0.2, 0, 2.0], np.float32)
    ep = np.asarray([0.2, 0, 2.0], np.float32)
    sf = sp / np.linalg.norm(sp)
    ef = ep / np.linalg.norm(ep)
    kw = dict(suv=np.asarray([CX - 20, CY]), euv=np.asarray([CX + 20, CY]),
              sf=sf, ef=ef, level=0, status=ST_GOOD)
    lx = m.new_line(sp, ep, slots[0], **kw)
    ly = m.new_line(sp, ep, slots[0], **kw)
    m._add_ln_obs(ly, slots[1], sf, ef)
    m._add_ln_obs(ly, slots[2], sf, ef)

    m.remove_keyframe(slots[0])
    assert m.ln_status[lx] == ST_DELETED
    assert m.ln_status[ly] == ST_GOOD
    assert m.ln_anchor_kf[ly] == slots[2]
    # re-anchored uvs = endpoints projected into the new anchor KF
    xyz = m.kf_R[slots[2]] @ sp + m.kf_t[slots[2]]
    exp_u = FX * xyz[0] / xyz[2] + CX
    np.testing.assert_allclose(m.ln_anchor_suv[ly][0], exp_u, atol=1e-4)


def test_obs_slot_reuse_and_recency_after_wrap():
    """Observation slots recycle freed entries and recency comes from write
    STAMPS, not slot order: after a freed slot is reused, the re-anchor
    must still pick the genuinely most-recent surviving observation
    (VERDICT r2 missing #2 / weak #8; reference keeps an unbounded obs list,
    feature3D.h:62-73)."""
    import dataclasses
    cfg = fast_config()
    m = _map(cfg)
    slots = []
    for k in range(6):
        fr = _frame(cfg, k, np.eye(3, dtype=np.float32),
                    np.asarray([0, 0, 0.1 * k], np.float32))
        slots.append(m.add_keyframe(fr))
    p = np.asarray([0, 0, 2.0], np.float32)
    f = np.asarray([0, 0, 1.0], np.float32)
    y = m.new_point(p, slots[0], np.asarray([CX, CY]), f, 0, status=ST_GOOD)
    for i in (1, 2, 3):
        m._add_pt_obs(y, slots[i], f, np.asarray([CX + i, CY]), 0)
    # evict KF1: frees y's slot index 1 (out-of-order hole)
    m.remove_keyframe(slots[1])
    assert (m.pt_obs_kf[y] == slots[1]).sum() == 0
    # new obs from KF4 recycles the freed slot -> newest obs lives at a
    # LOWER slot index than older ones
    m._add_pt_obs(y, slots[4], f, np.asarray([CX + 4, CY]), 0)
    row = m.pt_obs_kf[y]
    slot_of_kf4 = int(np.where(row == slots[4])[0][0])
    slot_of_kf3 = int(np.where(row == slots[3])[0][0])
    assert slot_of_kf4 < slot_of_kf3  # the hole was reused
    # evicting the anchor must re-anchor to KF4 (the most RECENT obs), not
    # to whatever sits in the highest slot index
    m.remove_keyframe(slots[0])
    assert m.pt_status[y] == ST_GOOD
    assert m.pt_anchor_kf[y] == slots[4]
    np.testing.assert_allclose(m.pt_anchor_uv[y], [CX + 4, CY])


def test_obs_capacity_covers_keyframe_ring():
    """max_obs_per_landmark >= max_kfs: with at most one obs per live KF
    and eviction freeing slots, adding an obs NEVER overwrites a live
    observation."""
    from plsvo_tpu.config import Config
    cfg = Config()
    assert cfg.caps.max_obs_per_landmark >= cfg.caps.max_kfs
