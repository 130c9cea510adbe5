"""One-hot matmul window extraction in PURE XLA vs XLA gather."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.image import gather_patch_windows


def make_mm(H, W, WP):
    def extract_mm(img, uv):
        corner = jnp.floor(uv - (WP / 2.0 - 1.0))
        iu = jnp.clip(corner[:, 0].astype(jnp.int32), 0, W - WP)
        iv = jnp.clip(corner[:, 1].astype(jnp.int32), 0, H - WP)
        U = uv.shape[0]
        hh = jnp.arange(H, dtype=jnp.int32)
        ww = jnp.arange(W, dtype=jnp.int32)
        dd = jnp.arange(WP, dtype=jnp.int32)
        rsel = (hh[None, None, :] == (iv[:, None] + dd[None, :])[..., None]
                ).astype(jnp.float32)  # (U, WP, H)
        bmat = jnp.einsum("uih,hw->uiw", rsel, img,
                          preferred_element_type=jnp.float32)
        csel = (ww[None, :, None] == (iu[:, None] + dd[None, :])[:, None, :]
                ).astype(jnp.float32)  # (U, W, WP)
        return jnp.einsum("uiw,uwj->uij", bmat, csel,
                          preferred_element_type=jnp.float32)

    return extract_mm


def timeit(f, img, uv, n=4):
    def scanify(iters):
        @jax.jit
        def run():
            def body(c, _):
                out = f(img + c, uv + c)
                return c + jnp.sum(out) * 1e-30, ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
            return c
        return run
    r24, r120 = scanify(24), scanify(120)
    jax.block_until_ready(r24()); jax.block_until_ready(r120())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(r24())
    t24 = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(r120())
    t120 = (time.perf_counter() - t0) / n
    return (t120 - t24) / 96 * 1e3


rng = np.random.default_rng(0)
for (H, W, U, WP, tag) in [
    (120, 188, 1024, 12, "L2 sparse-align"),
    (240, 376, 1024, 12, "L1"),
    (480, 1320, 768, 18, "atlas align2d"),
    (480, 752, 896, 16, "L0 epi-ish"),
]:
    img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    uv = jnp.asarray(
        np.stack([rng.uniform(WP, W - WP, U),
                  rng.uniform(WP, H - WP, U)], -1), jnp.float32)
    ex_mm = make_mm(H, W, WP)

    def ex_xla(img, uv):
        return gather_patch_windows(img, uv, WP)[0]

    w_mm = np.asarray(ex_mm(img, uv))
    corner = np.floor(np.asarray(uv) - (WP / 2.0 - 1.0)).astype(int)
    ref = np.stack([np.asarray(img)[v:v + WP, u:u + WP] for u, v in corner])
    err = np.abs(w_mm - ref).max()
    t_mm = timeit(ex_mm, img, uv)
    t_x = timeit(ex_xla, img, uv)
    print(f"[{tag}] err={err:.1e}  XLA-gather {t_x:7.3f} ms | "
          f"XLA-matmul {t_mm:7.3f} ms", flush=True)
