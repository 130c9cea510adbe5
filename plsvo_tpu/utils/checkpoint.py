"""Checkpoint / resume: full pipeline state serialization.

The reference has NO persistence — its only output is the trajectory text
file (SURVEY §5.4; app/run_pipeline.cpp:448-451). Because the rebuild's
state is flat arrays (MapState tables, seed tables, keyframe pyramids),
checkpointing is a single compressed npz + a JSON config blob, and resume
reconstructs a byte-equivalent FrameHandlerMono mid-sequence — needed for
long multi-host BA jobs.
"""
from __future__ import annotations

import json

import numpy as np


def save_state(vo, path: str):
    """Serialize a FrameHandlerMono (map, seeds, stage, last frame)."""
    import jax.numpy as jnp

    m = vo.map
    arrays = {}
    # map host tables: every ndarray attribute
    for name, val in vars(m).items():
        if isinstance(val, np.ndarray):
            arrays[f"map.{name}"] = val
    for l, p in enumerate(m.kf_pyr):
        arrays[f"map.kf_pyr.{l}"] = np.asarray(p)
    # seed tables + host mirrors
    for name, val in vo.pt_seeds._asdict().items():
        arrays[f"ptseed.{name}"] = np.asarray(val)
    for name, val in vo.ln_seeds._asdict().items():
        arrays[f"lnseed.{name}"] = np.asarray(val)
    for name, val in vo._seed_host.items():
        arrays[f"seedhost.{name}"] = val
    for name, val in vo._lnseed_host.items():
        arrays[f"lnseedhost.{name}"] = val
    arrays["seed_alive"] = vo._seed_alive
    arrays["lnseed_alive"] = vo._lnseed_alive
    # last frame
    lf = vo.last_frame
    if lf is not None:
        for name, val in vars(lf).items():
            if isinstance(val, np.ndarray):
                arrays[f"frame.{name}"] = val
        for l, p in enumerate(lf.pyr):
            arrays[f"frame.pyr.{l}"] = np.asarray(p)
        arrays["frame.meta"] = np.asarray(
            [lf.frame_id, lf.timestamp, float(lf.is_keyframe)])
    meta = {
        "stage": vo.stage,
        "frame_id": vo.frame_id,
        "batch_counter": vo.batch_counter,
        "n_levels": vo.n_levels,
        "config": vo.cfg.to_json(),
        "cam": {
            "width": vo.cam.width, "height": vo.cam.height,
            "fx": float(np.asarray(vo.cam.fx)), "fy": float(np.asarray(vo.cam.fy)),
            "cx": float(np.asarray(vo.cam.cx)), "cy": float(np.asarray(vo.cam.cy)),
            "dist": np.asarray(vo.cam.dist).tolist(),
        },
        "has_last_frame": lf is not None,
        "any_line_seeds": bool(vo._any_line_seeds),
    }
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str):
    """Rebuild a FrameHandlerMono from a checkpoint."""
    import jax.numpy as jnp

    from plsvo_tpu.camera import PinholeCamera
    from plsvo_tpu.config import Config
    from plsvo_tpu.pipeline.frame_handler import FrameHandlerMono
    from plsvo_tpu.pipeline.state import FrameState

    z = np.load(path)
    meta = json.loads(bytes(z["meta_json"]).decode())
    cam = PinholeCamera.create(
        meta["cam"]["width"], meta["cam"]["height"], meta["cam"]["fx"],
        meta["cam"]["fy"], meta["cam"]["cx"], meta["cam"]["cy"],
        meta["cam"]["dist"])
    cfg = Config.from_json(meta["config"])
    vo = FrameHandlerMono(cam, cfg)
    vo.stage = meta["stage"]
    vo.frame_id = meta["frame_id"]
    vo.batch_counter = meta["batch_counter"]

    m = vo.map
    for key in z.files:
        if key.startswith("map.kf_pyr."):
            l = int(key.split(".")[-1])
            m.kf_pyr[l] = jnp.asarray(z[key])
        elif key.startswith("map."):
            name = key[4:]
            getattr(m, name)[...] = z[key]
    m.invalidate()
    vo.pt_seeds = type(vo.pt_seeds)(**{
        n: jnp.asarray(z[f"ptseed.{n}"]) for n in vo.pt_seeds._fields})
    vo.ln_seeds = type(vo.ln_seeds)(**{
        n: jnp.asarray(z[f"lnseed.{n}"]) for n in vo.ln_seeds._fields})
    for name in vo._seed_host:
        if f"seedhost.{name}" in z.files:
            vo._seed_host[name][...] = z[f"seedhost.{name}"]
    for name in vo._lnseed_host:
        if f"lnseedhost.{name}" in z.files:
            vo._lnseed_host[name][...] = z[f"lnseedhost.{name}"]
    if "seed_alive" in z.files:
        vo._seed_alive[...] = z["seed_alive"]
        vo._lnseed_alive[...] = z["lnseed_alive"]
    vo._any_line_seeds = bool(meta.get("any_line_seeds", False))

    if meta["has_last_frame"]:
        fid, ts, is_kf = z["frame.meta"]
        pyr = [jnp.asarray(z[f"frame.pyr.{l}"]) for l in range(meta["n_levels"])]
        fr = FrameState.empty(cfg, int(fid), float(ts), pyr,
                              z["frame.R_f_w"], z["frame.t_f_w"])
        for key in z.files:
            if key.startswith("frame.") and not key.startswith("frame.pyr") \
                    and key not in ("frame.meta",):
                name = key[6:]
                if hasattr(fr, name) and isinstance(getattr(fr, name), np.ndarray):
                    getattr(fr, name)[...] = z[key]
        fr.is_keyframe = bool(is_kf)
        vo.last_frame = fr
    return vo
