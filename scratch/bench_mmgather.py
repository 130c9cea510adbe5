"""Matmul-gather prototype: patch extraction as (separable) bilinear-weight
matmuls on the MXU vs XLA packed-texture gathers.

patch(n,r,c) = sum_y wv[n,r,y] * ( sum_x img[y,x] * wh[n,c,x] )
with wv/wh triangular-hat (bilinear) weights. Vertical pass = ONE big
matmul (N*(P+1), H) @ (H, W); horizontal pass = batched contraction.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

H, W = 480, 752
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
ITERS = 50


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


from plsvo_tpu.image import patch_offsets, bilinear_sample


def make_uv(N):
    return jnp.asarray(np.stack([rng.uniform(20, W - 20, N),
                                 rng.uniform(20, H - 20, N)], -1), jnp.float32)


def extract_patches_mm(img, centers, P, dtype=jnp.float32):
    """Separable bilinear patch extraction via matmuls.
    centers: (N,2). Returns (N, P, P)."""
    N = centers.shape[0]
    S = P  # taps per axis
    half = P / 2.0
    r = jnp.arange(P, dtype=jnp.float32) - half + 0.5
    ys = centers[:, 1:2] + r[None]  # (N,P) tap y coords
    xs = centers[:, 0:1] + r[None]
    hh = jnp.arange(H, dtype=jnp.float32)
    ww = jnp.arange(W, dtype=jnp.float32)
    wv = jnp.maximum(0.0, 1.0 - jnp.abs(ys[..., None] - hh[None, None]))  # (N,P,H)
    wh = jnp.maximum(0.0, 1.0 - jnp.abs(xs[..., None] - ww[None, None]))  # (N,P,W)
    A = jnp.matmul(wv.reshape(N * P, H).astype(dtype), img.astype(dtype),
                   preferred_element_type=jnp.float32)  # (N*P, W)
    A = A.reshape(N, P, W)
    patch = jnp.einsum("nrx,ncx->nrc", A, wh.astype(A.dtype))
    return patch


def probe(N, P, dtype):
    uv = make_uv(N)

    @jax.jit
    def run(img, uv):
        def body(carry, _):
            uv = carry
            p = extract_patches_mm(img, uv, P, dtype)
            return uv + jnp.sum(p, axis=(1, 2))[:, None] * 1e-9, ()
        uv2, _ = jax.lax.scan(body, uv, None, length=ITERS)
        return uv2

    t = timeit(run, img, uv) / ITERS * 1000

    offs = patch_offsets(P)

    @jax.jit
    def run_g(img, uv):
        def body(carry, _):
            uv = carry
            p, ok = bilinear_sample(img, uv[:, None, :] + offs)
            return uv + jnp.sum(p, axis=-1)[:, None] * 1e-9, ()
        uv2, _ = jax.lax.scan(body, uv, None, length=ITERS)
        return uv2

    tg = timeit(run_g, img, uv) / ITERS * 1000

    # correctness
    p1 = extract_patches_mm(img, uv, P, dtype).reshape(N, -1)
    p2, _ = bilinear_sample(img, uv[:, None, :] + offs)
    err = float(jnp.max(jnp.abs(p1 - p2)))
    print(f"N={N} P={P} dtype={dtype.__name__:8s}: mm={t:7.3f} ms/iter  "
          f"gather={tg:7.3f} ms/iter  maxerr={err:.2e}")


probe(384, 8, jnp.float32)
probe(384, 8, jnp.bfloat16)
probe(960, 4, jnp.float32)
probe(960, 4, jnp.bfloat16)
probe(960, 8, jnp.bfloat16)
