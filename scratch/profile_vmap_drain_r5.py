"""r5: split the vmapped drain stall into (a) fut.result wait (device
queue + transfer), (b) BA write-backs, (c) seed inits, (d) _finish_one
bookkeeping, and measure the per-KF device dispatches' queue impact."""
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from plsvo_tpu.camera import PinholeCamera
    from plsvo_tpu.config import Config, PipelineConfig
    from plsvo_tpu.parallel import multi_vo
    from plsvo_tpu.parallel.multi_vo import BatchedVO
    from plsvo_tpu.pipeline import fused

    W, H = 752, 480
    cam = PinholeCamera.create(W, H, 460.0, 460.0, W / 2, H / 2)
    imgs = np.load("/root/repo/.bench_frames.npz")["imgs"]
    B = 8
    imgs_h = [np.clip(np.round(np.asarray(im)), 0, 255).astype(np.uint8)
              for im in imgs]
    n = imgs.shape[0]

    stats = {"wait": [], "ba": [], "init": [], "finish": [], "n_kf": 0}

    orig_complete = BatchedVO._complete_drains_batched

    def patched(self, force):
        from plsvo_tpu.parallel import ba as ba_mod

        while self._bfetch_q and force:
            entries, pend, pend_ba, fut, meta = self._bfetch_q.pop(0)
            t0 = time.perf_counter()
            got, init_got, ba_got = fused.flatunpack(fut.result(), meta)
            stats["wait"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            for (i, (_, bmeta)), (kf_R, kf_t, lm_pos) in zip(pend_ba, ba_got):
                ba_mod.write_back_window(self.vos[i].map, kf_R, kf_t, lm_pos,
                                         bmeta)
            stats["ba"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            for (i, (kf_slot, dm, dmin, _)), fetched in zip(pend, init_got):
                vo = self.vos[i]
                if self._seeds_idx is not None and i in self._seeds_idx:
                    self._install_seed_hooks(vo, self._seeds_idx.index(i))
                    try:
                        vo._complete_seed_init(kf_slot, dm, dmin, *fetched)
                    finally:
                        self._remove_seed_hooks(vo)
                else:
                    vo._complete_seed_init(kf_slot, dm, dmin, *fetched)
            stats["init"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            for (didx, frames), (res_f, ptc_b, lnc_b) in zip(entries, got):
                rs = [None] * len(self.vos)
                for k, i in enumerate(didx):
                    vo = self.vos[i]
                    if vo.stage != "default":
                        continue
                    r = self._finish_one(vo, k, frames[k], res_f, ptc_b,
                                         lnc_b)
                    vo.results.append(r)
                    rs[i] = r
                self._bready.append(rs)
            stats["finish"].append(time.perf_counter() - t0)
            newest = self._bq[-1] if self._bq else None
            if newest is not None:
                didx, frames = newest[0], newest[1]
                for k, i in enumerate(didx):
                    if self.vos[i].stage == "default":
                        self.vos[i].last_frame = frames[k]
            force = False

    BatchedVO._complete_drains_batched = patched

    for _pass in range(2):
        bvo = BatchedVO(cam, Config(pipeline=PipelineConfig(
            pipelined=True, pipeline_depth=8)), B, mode="vmap")
        t_all = time.perf_counter()
        for i in range(n):
            t0 = time.perf_counter()
            bvo.add_images([imgs_h[max(0, i - k)] for k in range(B)],
                           i / 30.0)
            dt = time.perf_counter() - t0
            if _pass:
                print(f"frame {i}: {dt*1e3:.1f}ms", flush=True)
        bvo.flush()
        total = time.perf_counter() - t_all
        print(f"pass{_pass} total {total:.2f}s agg_fps={B*n/total:.1f}",
              flush=True)
        if _pass == 0:
            for k in stats:
                stats[k] = [] if isinstance(stats[k], list) else 0
    n_kf = sum(1 for vo in bvo.vos for r in vo.results if r and r.is_keyframe)
    print(f"KF events: {n_kf}")
    for k in ("wait", "ba", "init", "finish"):
        v = stats[k]
        print(f"{k}: n={len(v)} total={sum(v)*1e3:.0f}ms "
              f"mean={np.mean(v)*1e3:.0f}ms max={max(v)*1e3:.0f}ms",
              flush=True)


if __name__ == "__main__":
    main()
