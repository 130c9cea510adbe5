"""Device cost of the per-keyframe windowed local BA at production shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.parallel import ba as ba_mod

rng = np.random.default_rng(0)


def synth_problem(K, L, O=8, fill=0.6):
    kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    kf_t = rng.normal(0, 0.1, (K, 3)).astype(np.float32)
    lm = rng.normal(0, 1, (L, 3)).astype(np.float32) + np.array([0, 0, 4])
    obs_kf = rng.integers(0, K, (L, O)).astype(np.int32)
    obs_valid = rng.random((L, O)) < fill
    xyz = np.einsum("kij,lj->lki", kf_R, lm) + kf_t[None].transpose(1, 0, 2)[0][None] * 0
    f = lm[:, None, :] + rng.normal(0, 0.01, (L, O, 3))
    f = f / np.linalg.norm(f, axis=-1, keepdims=True)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    return ba_mod.BAProblem(
        kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
        kf_fixed=jnp.asarray(fixed),
        lm_pos=jnp.asarray(lm), lm_valid=jnp.ones(L, bool),
        obs_kf=jnp.asarray(obs_kf), obs_f=jnp.asarray(f, jnp.float32),
        obs_valid=jnp.asarray(obs_valid))


for K, L in ((16, 512), (16, 1024), (16, 2048)):
    prob = synth_problem(K, L)
    for n_iter in (5,):
        out, st = ba_mod.bundle_adjust(prob, n_iter=n_iter)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        N = 5
        for _ in range(N):
            out, st = ba_mod.bundle_adjust(prob, n_iter=n_iter)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"K={K} L={L} n_iter={n_iter}: {dt:.1f} ms "
              f"({dt/n_iter:.1f} ms/iter)", flush=True)
