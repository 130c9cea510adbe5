"""Microbench: in-Pallas one-hot-matmul window extraction vs XLA gather,
at sparse-align level sizes (small images) and atlas size (level-0)."""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.image import gather_patch_windows


def make_mm(H, W, U, WP, UB):
    def _kernel_mm(img_ref, iu_ref, iv_ref, out_ref):
        img = img_ref[:]
        b = pl.program_id(0)
        iv = iv_ref[b]  # (UB,)
        rows = jax.lax.broadcasted_iota(jnp.int32, (UB, WP, H), 2)
        dv = jax.lax.broadcasted_iota(jnp.int32, (UB, WP, H), 1)
        rsel = (rows == iv[:, None, None] + dv).astype(jnp.float32)
        bmat = jax.lax.dot_general(
            rsel.reshape(UB * WP, H), img,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(UB, WP, W)
        iu = iu_ref[b]
        cols = jax.lax.broadcasted_iota(jnp.int32, (UB, W, WP), 1)
        dj = jax.lax.broadcasted_iota(jnp.int32, (UB, W, WP), 2)
        csel = (cols == iu[:, None, None] + dj).astype(jnp.float32)
        out_ref[:] = jax.lax.dot_general(
            bmat, csel,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    @jax.jit
    def extract_mm(img, uv):
        corner = jnp.floor(uv - (WP / 2.0 - 1.0)).astype(jnp.int32)
        iu = jnp.clip(corner[:, 0], 0, W - WP).reshape(U // UB, UB)
        iv = jnp.clip(corner[:, 1], 0, H - WP).reshape(U // UB, UB)
        return pl.pallas_call(
            _kernel_mm,
            grid=(U // UB,),
            in_specs=[
                pl.BlockSpec((H, W), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_shape=jax.ShapeDtypeStruct((U, WP, WP), jnp.float32),
            out_specs=pl.BlockSpec((UB, WP, WP), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(img, iu, iv)

    return extract_mm


def timeit(f, *a, n=50):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)

for (H, W, U, WP, UB, tag) in [
    (120, 188, 1024, 12, 128, "L2-size, sparse-align"),
    (240, 376, 1024, 12, 128, "L1-size"),
    (480, 1280, 768, 18, 64, "atlas-size, align2d"),
]:
    img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    uv = jnp.asarray(
        np.stack([rng.uniform(WP, W - WP, U),
                  rng.uniform(WP, H - WP, U)], -1), jnp.float32)
    ex_mm = make_mm(H, W, U, WP, UB)

    @jax.jit
    def ex_xla(img, uv):
        return gather_patch_windows(img, uv, WP)[0]

    w_mm = np.asarray(ex_mm(img, uv))
    # reference: integer crops
    corner = np.floor(np.asarray(uv) - (WP / 2.0 - 1.0)).astype(int)
    ref = np.stack([np.asarray(img)[v:v + WP, u:u + WP]
                    for u, v in corner])
    print(f"[{tag}] mm err: {np.abs(w_mm - ref).max():.2e}", flush=True)
    t_mm = timeit(ex_mm, img, uv)
    t_x = timeit(ex_xla, img, uv)
    print(f"[{tag}] U={U} WP={WP}: XLA {t_x:7.3f} ms | mm {t_mm:7.3f} ms",
          flush=True)
