"""Is a per-feature (P+1,P+1) window slice-gather + static shifted slices
faster than 64 packed-4 tap gathers for axis-aligned 8x8 patches?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.image import bilinear_sample, patch_offsets

H, W = 480, 1400  # atlas-like
N = 384
P = 8
ITERS = 50
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
uv = jnp.asarray(
    np.stack([rng.uniform(10, W - 20, N), rng.uniform(10, H - 20, N)], -1),
    jnp.float32)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n / ITERS * 1e6  # us per iter


offs = patch_offsets(P, jnp.float32)


@jax.jit
def taps_gather(img, uv):
    def body(c, _):
        pos = (uv + c) [:, None, :] + offs[None]
        vals, ok = bilinear_sample(img, pos)
        return c + jnp.sum(vals) * 1e-20, ()
    c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
    return c


@jax.jit
def window_gather(img, uv):
    # pad so slices never clamp
    pimg = jnp.pad(img, ((0, P + 2), (0, P + 2)))

    def body(c, _):
        uvc = uv + c
        base = uvc - (P / 2.0 - 0.5)  # first tap position
        i0 = jnp.floor(base).astype(jnp.int32)
        f = base - i0  # (N,2) in [0,1)
        starts = jnp.stack([i0[:, 1], i0[:, 0]], -1)  # (v,u)
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(pimg, (s[0], s[1]),
                                            (P + 1, P + 1)))(starts)
        fu = f[:, 0][:, None, None]
        fv = f[:, 1][:, None, None]
        p = ((1 - fu) * (1 - fv) * win[:, :P, :P]
             + fu * (1 - fv) * win[:, :P, 1:]
             + (1 - fu) * fv * win[:, 1:, :P]
             + fu * fv * win[:, 1:, 1:])
        return c + jnp.sum(p) * 1e-20, ()
    c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
    return c


t1 = timeit(taps_gather, img, uv)
t2 = timeit(window_gather, img, uv)
print(f"packed-4 taps : {t1:8.1f} us/iter ({N}x{P}x{P} patches)")
print(f"window slices : {t2:8.1f} us/iter")

# numeric equivalence
pos = uv[:, None, :] + offs[None]
ref, _ = bilinear_sample(img, pos)
pimg = jnp.pad(img, ((0, P + 2), (0, P + 2)))
base = uv - (P / 2.0 - 0.5)
i0 = jnp.floor(base).astype(jnp.int32)
f = base - i0
starts = jnp.stack([i0[:, 1], i0[:, 0]], -1)
win = jax.vmap(lambda s: jax.lax.dynamic_slice(
    pimg, (s[0], s[1]), (P + 1, P + 1)))(starts)
fu = f[:, 0][:, None, None]
fv = f[:, 1][:, None, None]
p = ((1 - fu) * (1 - fv) * win[:, :P, :P] + fu * (1 - fv) * win[:, :P, 1:]
     + (1 - fu) * fv * win[:, 1:, :P] + fu * fv * win[:, 1:, 1:])
err = jnp.max(jnp.abs(p.reshape(N, -1) - ref))
print("max abs err:", float(err))
