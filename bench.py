"""Benchmark: full VO pipeline frames/s on one chip, 752x480 (EuRoC-size).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "batched_fps_b8": N, "batched_seqs": 8}

value = single-sequence latency-path fps. batched_fps_b8 = aggregate
frames/s tracking 8 sequences through one vmapped device program per frame
(BatchedVO, BASELINE.json config 4) — the production-serving throughput
number on ONE chip. Set BENCH_BATCHED=0 to skip the batched phase.

Baseline: the reference publishes no numbers (BASELINE.md); its de-facto
target is real-time tracking at the 30 fps camera rate it assumes for
timestamps (app/run_pipeline.cpp:149,234). vs_baseline is therefore
fps / 30.
"""
import json
import os
import sys
import time

import numpy as np


def _device_step_ms(vo, img) -> float:
    """Slope-measured DEVICE time of the complete tracked-frame program at
    the handler's end-of-sequence state (map populated, seeds live).
    Tunnel-independent: a scan over ITERS iterations with every float input
    perturbed by the carry (nothing hoists), timed at two lengths — the
    slope removes dispatch/transfer overheads entirely, so round-over-round
    perf claims survive tunnel-bandwidth variance (VERDICT r3 weak #2)."""
    import jax
    import jax.numpy as jnp

    from plsvo_tpu.image import build_pyramid
    from plsvo_tpu.pipeline import fused

    pl = vo.cfg.pipeline
    pyr = tuple(build_pyramid(jnp.asarray(img, jnp.float32), vo.n_levels))
    last = vo.last_frame
    mt = vo._map_tables()
    kf_flat = vo.map.kf_atlas_flat(pl.n_pyr_levels)
    step_kwargs = {k: v for k, v in vo._step_kwargs().items()
                   if k != "specs"}
    blob = fused.unpack_blob(vo._last_blob(last), vo._blob_specs())
    nxt0 = fused.NextFrameInputs(
        last=fused.LastFrameTables(*blob[:11]), R_last=blob[11],
        t_last=blob[12], pt_last_optim=blob[13], ln_last_optim=blob[14])

    def perturb(tree, eps):
        return jax.tree.map(
            lambda a: a + eps if (hasattr(a, "dtype") and
                                  jnp.issubdtype(a.dtype, jnp.floating))
            else a, tree)

    def stage(eps):
        nxt = perturb(nxt0, eps)
        return fused._track_frame_step_impl(
            perturb(last.pyr, eps), perturb(pyr, eps),
            perturb(kf_flat, eps), nxt.last, nxt.R_last, nxt.t_last,
            nxt.pt_last_optim, nxt.ln_last_optim, perturb(mt, eps),
            vo.pt_seeds, vo.ln_seeds,
            jnp.asarray(vo.batch_counter, jnp.int32),
            vo.cam.fx, vo.cam.fy, vo.cam.cx, vo.cam.cy,
            emit_next=True, frame_id=jnp.asarray(0, jnp.int32),
            **step_kwargs)

    def scanify(iters):
        @jax.jit
        def run():
            def body(carry, _):
                out = stage(carry)
                leaves = [l for l in jax.tree.leaves(out)
                          if hasattr(l, "dtype")
                          and jnp.issubdtype(l.dtype, jnp.floating)]
                s = sum(jnp.sum(l) for l in leaves)
                return carry + s * 1e-30, ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
            return c
        return run

    n_lo, n_hi, reps = 16, 64, 3
    r_lo, r_hi = scanify(n_lo), scanify(n_hi)
    jax.block_until_ready(r_lo())
    jax.block_until_ready(r_hi())
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(r_lo())
    t_lo = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(r_hi())
    t_hi = (time.perf_counter() - t0) / reps
    return (t_hi - t_lo) / (n_hi - n_lo) * 1e3


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent compile cache: repeated bench runs skip XLA compilation
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from plsvo_tpu.camera import PinholeCamera
    from plsvo_tpu.config import Config
    from plsvo_tpu.pipeline.frame_handler import STAGE_DEFAULT, FrameHandlerMono
    from plsvo_tpu.utils import synthetic

    W, H = 752, 480
    cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
    rng = np.random.default_rng(3)
    # BENCH_SCENE=boxes: NON-planar scene (textured boxes on the ground
    # plane — multiple depth layers + occlusions) so fps is also measured
    # on real-3D-statistics imagery, not only the planar family the
    # homography bootstrap favors (VERDICT r3 weak #8)
    scene_kind = os.environ.get("BENCH_SCENE", "plane")

    n_frames = 72
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".bench_frames_{scene_kind}.npz")
    if scene_kind == "plane":
        legacy = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_frames.npz")
        if os.path.exists(legacy):
            cache = legacy
    if os.path.exists(cache) and np.load(cache)["imgs"].shape[0] == n_frames:
        print("loading cached frames...", file=sys.stderr)
        imgs = jnp.asarray(np.load(cache)["imgs"])
    else:
        print(f"rendering {n_frames} {scene_kind} frames...", file=sys.stderr)
        Rs, ts_ = [], []
        for i in range(n_frames):
            ang = 0.002 * i
            Rs.append(np.asarray(
                [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                 [-np.sin(ang), 0, np.cos(ang)]], np.float32))
            ts_.append(np.asarray(
                [0.03 * i, 0.008 * np.sin(0.3 * i), -2.0], np.float32))
        if scene_kind == "boxes":
            scene = synthetic.make_box_scene(rng, size=2048,
                                             texel_size=0.003)
            frames = [np.asarray(synthetic.render_boxes_aa(
                scene, cam, jnp.asarray(R), jnp.asarray(t))[0])
                for R, t in zip(Rs, ts_)]
            imgs = jnp.asarray(np.stack(frames))
        else:
            scene = synthetic.make_scene(rng, size=2048, texel_size=0.003)
            # chunked: one 72-frame supersampled render batch exceeds HBM
            chunks = []
            for c in range(0, n_frames, 18):
                chunks.append(np.asarray(synthetic.render_batch_aa(
                    scene, cam, np.stack(Rs[c:c + 18]),
                    np.stack(ts_[c:c + 18]), ss=2)))
            imgs = jnp.asarray(np.concatenate(chunks, 0))
        np.savez_compressed(cache, imgs=np.asarray(imgs))
        print("rendered", file=sys.stderr)
    imgs.block_until_ready()

    import dataclasses

    from plsvo_tpu.config import PipelineConfig

    # pipelined mode: dispatch-before-fetch (results up to depth frames
    # late) — the production execution mode; the ~28 ms/fetch wire latency
    # amortizes over pipeline_depth frames and host bookkeeping overlaps
    # device compute
    out = {
        "metric": "vo_fps_752x480_points_lines",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "scene": scene_kind,
    }
    if os.environ.get("BENCH_SINGLE", "1") != "0":
        cfg = Config(pipeline=PipelineConfig(pipelined=True,
                                             pipeline_depth=12))
        # TWO full passes with fresh handlers: pass 0 compiles every
        # program variant the sequence will trigger (seed-width buckets
        # appear mid-sequence and a cold-cache compile is ~50 s over the
        # remote-compile tunnel — landing inside the measurement window it
        # destroys the number); pass 1 re-tracks from scratch against the
        # now-warm persistent cache and is the timed run.
        for _pass in range(2):
            vo = FrameHandlerMono(cam, cfg)
            times = []
            t_all0 = time.perf_counter()
            for i, img in enumerate(imgs):
                t0 = time.perf_counter()
                r = vo.add_image(img, i / 30.0)
                dt = time.perf_counter() - t0
                times.append((r.stage if r is not None else STAGE_DEFAULT,
                              dt))
                if r is not None:
                    print(f"pass{_pass} frame {r.frame_id}: stage={r.stage} "
                          f"q={r.quality} "
                          f"npt={r.n_pt_matches} nseg={r.n_seg_matches} "
                          f"kf={r.is_keyframe} {dt*1000:.1f}ms",
                          file=sys.stderr)
            vo.flush()
            total = time.perf_counter() - t_all0

        # steady-state: the last half of the DEFAULT-stage frames — by then
        # the seed-table width buckets have stabilized, so no
        # program-variant compiles/loads remain in the window. MEAN, not
        # median: pipelined execution delivers work in bursts (depth-1
        # cheap dispatch-only calls then one burst fetch) and a median
        # would only see the cheap calls.
        default_times = [dt for s, dt in times if s == STAGE_DEFAULT]
        if len(default_times) > 10:
            steady = default_times[len(default_times) // 2:]
        else:
            steady = default_times or [total / n_frames]
        per_frame = float(np.mean(steady))
        fps = 1.0 / per_frame
        out["value"] = round(fps, 2)
        out["vs_baseline"] = round(fps / 30.0, 3)
        # tunnel-independent companion record: slope-measured device time
        # of the full tracked-frame program at end-of-sequence state
        try:
            out["device_step_ms"] = round(
                _device_step_ms(vo, np.asarray(imgs[-1])), 2)
        except Exception as e:
            print(f"device_step_ms failed: {e}", file=sys.stderr)

    # ---- batched multi-sequence throughput (one chip, B sequences) ----
    # stagger the streams (sequence k starts k frames in, wrapping) so
    # keyframes desynchronize across the batch like real deployments —
    # identical streams make all B sequences pay the keyframe path in the
    # same step. uint8 ingestion: what real cameras deliver, and 4x less
    # tunnel upload bandwidth than f32.
    # TWO passes per mode, same reason as the single-seq phase: pass 0
    # warms every program variant (once ever, via the persistent cache),
    # pass 1 is the timed run.
    def run_batched(mode: str):
        from plsvo_tpu.parallel.multi_vo import BatchedVO

        B = int(os.environ.get("BENCH_BATCH", "8"))
        imgs_h = [np.clip(np.round(np.asarray(im)), 0, 255).astype(np.uint8)
                  for im in imgs]
        # depth 12 A/B'd 122.2 vs depth 8's 80.1 agg fps in the same
        # weather window (the drain's fixed costs amortize over more
        # frames; the vmapped step chain keeps the device fed either way)
        depth = int(os.environ.get("BENCH_BATCH_DEPTH", "12"))
        for _pass in range(2):
            bvo = BatchedVO(cam, Config(pipeline=PipelineConfig(
                pipelined=True, pipeline_depth=depth)), B, mode=mode)
            bt = []
            for i in range(n_frames):
                t0 = time.perf_counter()
                bvo.add_images([imgs_h[max(0, i - k)] for k in range(B)],
                               i / 30.0)
                dt = time.perf_counter() - t0
                bt.append((dt, all(s == "default" for s in bvo.stages)))
                print(f"pass{_pass} {mode} frame {i}: {dt*1000:.1f}ms "
                      f"stages={set(bvo.stages)}", file=sys.stderr)
            bvo.flush()
        defaults = [dt for dt, ok in bt if ok]
        steady_b = (defaults[len(defaults) // 2:]
                    if len(defaults) > 6 else defaults)
        return (round(B / float(np.mean(steady_b)), 2) if steady_b
                else None), B

    # the vmapped path IS the production batched mode (BatchedVO
    # mode="auto"; fastest measured single-chip mode since r5 AND the
    # only one that shard-maps over a mesh) — it provides the headline
    # batched_fps_b8. Streams mode is recorded alongside for comparison.
    if os.environ.get("BENCH_VMAP", "1") != "0":
        try:
            fps_b, B = run_batched("vmap")
            if fps_b:
                out["batched_fps_b8"] = fps_b
                out["batched_fps_b8_vmap"] = fps_b
                out["batched_mode"] = "vmap"
                out["batched_seqs"] = B
        except Exception as e:  # never lose the JSON line to this phase
            print(f"vmap phase failed: {e}", file=sys.stderr)
    if os.environ.get("BENCH_BATCHED", "1") != "0":
        try:
            fps_s, B = run_batched("streams")
            if fps_s:
                out["batched_fps_b8_streams"] = fps_s
                out["batched_seqs"] = B
                if "batched_fps_b8" not in out:
                    out["batched_fps_b8"] = fps_s
                    out["batched_mode"] = "streams"
        except Exception as e:
            print(f"streams phase failed: {e}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
