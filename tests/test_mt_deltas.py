"""Carry-mode map sync: MapState delta packing (pack_mt_deltas) applied
in-graph (fused.apply_mt_deltas) must reproduce EXACTLY the device tables a
full re-upload of the mirror would give — across landmark creation,
status changes, keyframe installs with anchor refresh + obs appends,
evictions with slot reuse, and delta-queue spill."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from plsvo_tpu.config import fast_config
from plsvo_tpu.pipeline import fused
from plsvo_tpu.pipeline.state import FrameState, MapState, ST_GOOD


def _mk_map():
    cfg = fast_config()
    m = MapState(cfg, 5, (240, 320), intrinsics=(250.0, 250.0, 160.0, 120.0))
    return cfg, m


def _mk_frame(cfg, fid, rng, n_pt=24, n_seg=6):
    pyr = [jnp.zeros((240 >> l, 320 >> l), jnp.float32) for l in range(5)]
    ang = 0.01 * fid
    R = np.asarray([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                    [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    fr = FrameState.empty(cfg, fid, fid / 30.0, pyr, R,
                          np.asarray([0.05 * fid, 0, 0], np.float32))
    fr.pt_uv[:n_pt] = rng.uniform(10, 200, (n_pt, 2))
    fr.pt_f[:n_pt] = rng.normal(size=(n_pt, 3))
    fr.pt_f[:n_pt] /= np.linalg.norm(fr.pt_f[:n_pt], axis=-1, keepdims=True)
    fr.pt_valid[:n_pt] = True
    fr.seg_suv[:n_seg] = rng.uniform(10, 200, (n_seg, 2))
    fr.seg_euv[:n_seg] = rng.uniform(10, 200, (n_seg, 2))
    fr.seg_sf[:n_seg] = rng.normal(size=(n_seg, 3))
    fr.seg_ef[:n_seg] = rng.normal(size=(n_seg, 3))
    fr.seg_valid[:n_seg] = True
    return fr


def _assert_carry_matches_mirror(m, carry):
    m.invalidate()
    m._dev_obs.clear()
    for g in m._obs_dirty.values():
        g.clear()
    fresh = fused.map_tables_from_state(m)
    for name in fused.MapTables._fields:
        a = np.asarray(getattr(carry, name))
        b = np.asarray(getattr(fresh, name))
        if name.endswith("obs_kf"):
            # carry may keep stale PAYLOAD values for dead slots (kf=-1
            # masks them, exactly like the mirror's _obs_clear trick)
            np.testing.assert_array_equal(a, b, err_msg=name)
            continue
        if "obs_" in name:
            kf = np.asarray(getattr(carry, name.split("_obs_")[0]
                                    + "_obs_kf"))
            live = kf >= 0
            np.testing.assert_allclose(
                a[live], b[live], rtol=0, atol=0, err_msg=name)
            continue
        np.testing.assert_allclose(a, b, rtol=0, atol=0, err_msg=name)


def _sync(m, carry, widths=None):
    w = widths or {}
    DP = w.get("DP", fused.MT_DELTA_DP)
    DL = w.get("DL", fused.MT_DELTA_DL)
    OP = w.get("OP", fused.MT_DELTA_OP)
    OL = w.get("OL", fused.MT_DELTA_OL)
    NE = w.get("NE", fused.MT_DELTA_NE)
    n = 0
    while m.mt_dirty_pending() or n == 0:
        blob = m.pack_mt_deltas(DP, DL, OP, OL, NE)
        assert blob.shape[0] == fused.mt_delta_len(
            m.cfg.caps.max_kfs, DP, DL, OP, OL, NE)
        carry = fused.apply_mt_deltas(
            carry, jnp.asarray(blob), DP=DP, DL=DL, OP=OP, OL=OL, NE=NE)
        n += 1
        assert n < 50, "delta queue never drains"
    return carry


def test_deltas_landmark_creation_and_status():
    rng = np.random.default_rng(0)
    cfg, m = _mk_map()
    fr = _mk_frame(cfg, 0, rng)
    kf = m.add_keyframe(fr)
    carry = fused.map_tables_from_state(m)
    m.mt_mark_clean()

    rows = []
    for i in range(40):
        r = m.new_point(rng.normal(size=3), kf, rng.uniform(0, 200, 2),
                        rng.normal(size=3), i % 3)
        rows.append(r)
    for i in range(12):
        m.new_line(rng.normal(size=3), rng.normal(size=3), kf,
                   rng.uniform(0, 200, 2), rng.uniform(0, 200, 2),
                   rng.normal(size=3), rng.normal(size=3), 0)
    # host-side status decisions (deletion/promotion) via mark_mt_dirty
    m.pt_status[rows[3]] = 0
    m.pt_status[rows[5]] = ST_GOOD
    m.mark_mt_dirty("pt", [rows[3], rows[5]])

    carry = _sync(m, carry)
    _assert_carry_matches_mirror(m, carry)


def test_deltas_keyframe_install_evict_reuse():
    rng = np.random.default_rng(1)
    cfg, m = _mk_map()
    fr0 = _mk_frame(cfg, 0, rng)
    kf0 = m.add_keyframe(fr0)
    carry = fused.map_tables_from_state(m)
    m.mt_mark_clean()

    # landmarks anchored at kf0, then several keyframes that re-observe
    # them (anchor refresh + obs appends ride the deltas)
    lms = [m.new_point(rng.normal(size=3) + (0, 0, 3), kf0,
                       rng.uniform(0, 200, 2), rng.normal(size=3), 0)
           for _ in range(30)]
    for fid in range(1, 4):
        fr = _mk_frame(cfg, fid, rng)
        fr.pt_lm[:30] = lms
        fr.pt_valid[:30] = True
        m.add_keyframe(fr)
    carry = _sync(m, carry)
    _assert_carry_matches_mirror(m, carry)

    # evict a slot, then REUSE it within the same sync window
    m.remove_keyframe(1)
    fr = _mk_frame(cfg, 9, rng)
    fr.pt_lm[:30] = lms
    fr.pt_valid[:30] = True
    slot = m.add_keyframe(fr)
    assert slot == 1  # the freed slot is reused
    carry = _sync(m, carry)
    _assert_carry_matches_mirror(m, carry)


def test_deltas_spill_with_tiny_widths():
    """Every width forced tiny: deltas spill over many blobs and must
    still converge to the mirror exactly (idempotent row snapshots)."""
    rng = np.random.default_rng(2)
    cfg, m = _mk_map()
    fr0 = _mk_frame(cfg, 0, rng)
    kf0 = m.add_keyframe(fr0)
    carry = fused.map_tables_from_state(m)
    m.mt_mark_clean()
    for i in range(50):
        m.new_point(rng.normal(size=3), kf0, rng.uniform(0, 200, 2),
                    rng.normal(size=3), 0)
    for i in range(20):
        m.new_line(rng.normal(size=3), rng.normal(size=3), kf0,
                   rng.uniform(0, 200, 2), rng.uniform(0, 200, 2),
                   rng.normal(size=3), rng.normal(size=3), 0)
    m.remove_keyframe(0)
    fr = _mk_frame(cfg, 5, rng)
    m.add_keyframe(fr)
    carry = _sync(m, carry, widths=dict(DP=8, DL=4, OP=8, OL=4, NE=1))
    _assert_carry_matches_mirror(m, carry)


def test_struct_apply_matches_host():
    """apply_struct_to_mt scatters exactly what the host mirror applies
    from the fetched struct-opt results."""
    rng = np.random.default_rng(3)
    cfg, m = _mk_map()
    fr = _mk_frame(cfg, 0, rng)
    kf = m.add_keyframe(fr)
    rows = [m.new_point(rng.normal(size=3), kf, rng.uniform(0, 200, 2),
                        rng.normal(size=3), 0) for _ in range(10)]
    lrows = [m.new_line(rng.normal(size=3), rng.normal(size=3), kf,
                        rng.uniform(0, 200, 2), rng.uniform(0, 200, 2),
                        rng.normal(size=3), rng.normal(size=3), 0)
             for _ in range(4)]
    carry = fused.map_tables_from_state(m)
    m.mt_mark_clean()

    class R:
        st_pt_lm = jnp.asarray(rows[:4], jnp.int32)
        st_pt_pos = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        st_pt_valid = jnp.asarray([True, False, True, True])
        st_ln_lm = jnp.asarray(lrows[:2], jnp.int32)
        st_ln_spos = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
        st_ln_epos = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
        st_ln_valid = jnp.asarray([True, True])

    carry = fused.apply_struct_to_mt(carry, R)
    # host mirror applies the same (as _post_fused does)
    vs = np.asarray(R.st_pt_valid)
    m.pt_pos[np.asarray(R.st_pt_lm)[vs]] = np.asarray(R.st_pt_pos)[vs]
    m.ln_spos[np.asarray(R.st_ln_lm)] = np.asarray(R.st_ln_spos)
    m.ln_epos[np.asarray(R.st_ln_lm)] = np.asarray(R.st_ln_epos)
    _assert_carry_matches_mirror(m, carry)


def test_pack_bits16_roundtrip():
    """pack_bits16 words survive the f32 fetch path exactly (16 bits per
    word stay integer-exact in f32) and unpack to the original mask."""
    rng = np.random.default_rng(4)
    for n in (1, 15, 16, 17, 512, 250):
        mask = rng.random(n) > 0.5
        words = fused.pack_bits16(jnp.asarray(mask))
        # simulate the flatpack f32 round trip
        back = fused.unpack_bits16(
            np.asarray(words, np.float32).astype(np.float64), n)
        np.testing.assert_array_equal(back, mask, err_msg=f"n={n}")
