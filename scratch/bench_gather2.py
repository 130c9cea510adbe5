"""Amortized gather-strategy microbench: everything inside ONE jit with a
long scan so launch overhead vanishes. Compares per-tap packed gathers vs
row-segment gathers vs cached-window resampling, at align and align2d shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_default_matmul_precision", "highest")

H, W = 480, 752
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


from plsvo_tpu.image import patch_offsets, bilinear_sample, pack_bilinear

ITERS = 100


def make_uv(N):
    return jnp.asarray(np.stack([rng.uniform(20, W - 20, N),
                                 rng.uniform(20, H - 20, N)], -1), jnp.float32)


def scan_probe(fn_one_iter, uv):
    """Run fn ITERS times inside one jit; returns per-iter ms."""
    @jax.jit
    def run(img, uv):
        def body(carry, _):
            uv = carry
            s = fn_one_iter(img, uv)
            uv = uv + s * 1e-9
            return uv, ()
        uv2, _ = jax.lax.scan(body, uv, None, length=ITERS)
        return uv2
    t = timeit(run, img, uv)
    return t / ITERS * 1000


def probe_packed(P):
    offs = patch_offsets(P)
    def one(img, uv):
        pos = uv[:, None, :] + offs
        I, ok = bilinear_sample(img, pos)
        return jnp.sum(I, axis=-1, keepdims=True) * jnp.asarray([1.0, 1.0])[None]
    return one


def probe_rows(P):
    """Row-segment gather: (P+1) rows of (P+1) contiguous floats per patch,
    bilinear combined in-register."""
    S = P + 1
    def one(img, uv):
        u0 = jnp.floor(uv[:, 0] - P / 2.0 + 0.5)
        v0 = jnp.floor(uv[:, 1] - P / 2.0 + 0.5)
        fu = (uv[:, 0] - P / 2.0 + 0.5) - u0
        fv = (uv[:, 1] - P / 2.0 + 0.5) - v0
        u0i = jnp.clip(u0.astype(jnp.int32), 0, W - S - 1)
        v0i = jnp.clip(v0.astype(jnp.int32), 0, H - S - 1)
        # gather (N, S, S+1) row segments: rows v0..v0+S, cols u0..u0+S
        def get(img, v0i, u0i):
            return jax.lax.dynamic_slice(img, (v0i, u0i), (S + 1, S + 1))
        win = jax.vmap(get, in_axes=(None, 0, 0))(img, v0i, u0i)  # (N,S+1,S+1)
        # horizontal lerp then vertical lerp -> (N,P,P)
        wl = (1.0 - fu)[:, None, None]
        horiz = wl * win[:, :, :S] + (1 - wl) * win[:, :, 1:S + 1]
        vl = (1.0 - fv)[:, None, None]
        patch = vl * horiz[:, :S - 1, :] + (1 - vl) * horiz[:, 1:S, :]
        return jnp.sum(patch, axis=(1, 2), keepdims=False)[:, None] * jnp.ones((1, 2))
    return one


def probe_window_resample(P, WIN):
    """Cached window (gathered once OUTSIDE the loop) + dense matmul
    resample per iteration."""
    def make(img, uv):
        anchor = jnp.floor(uv).astype(jnp.int32) - WIN // 2 + 1
        ay = jnp.clip(anchor[:, 1], 0, H - WIN)
        ax = jnp.clip(anchor[:, 0], 0, W - WIN)
        def slc(y, x):
            return jax.lax.dynamic_slice(img, (y, x), (WIN, WIN))
        wins = jax.vmap(slc, in_axes=(0, 0))(ay, ax)
        org = jnp.stack([ax, ay], -1).astype(jnp.float32)
        return wins, org

    def one_factory():
        r = jnp.arange(P, dtype=jnp.float32) - P / 2.0 + 0.5
        a = jnp.arange(WIN, dtype=jnp.float32)
        def one(wins_org, uv):
            wins, org = wins_org
            rel = uv - org
            ys = rel[:, 1:2, None] + r[None, :, None]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys - a[None, None, :]))
            xs = rel[:, 0:1, None] + r[None, :, None]
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - a[None, None, :]))
            t = jnp.einsum("nia,nab->nib", wy, wins)
            patch = jnp.einsum("nib,njb->nij", t, wx)
            return jnp.sum(patch, axis=(1, 2))[:, None] * jnp.ones((1, 2))
        return one

    one = one_factory()

    @jax.jit
    def run(img, uv):
        wins_org = make(img, uv)
        def body(carry, _):
            uv = carry
            s = one(wins_org, uv)
            uv = uv + s * 1e-9
            return uv, ()
        uv2, _ = jax.lax.scan(body, uv, None, length=ITERS)
        return uv2
    return run


for (label, N, P) in [("align shape", 960, 4), ("align2d shape", 384, 8)]:
    uv = make_uv(N)
    t_packed = scan_probe(probe_packed(P), uv)
    t_rows = scan_probe(probe_rows(P), uv)
    win = P + 8
    run_win = probe_window_resample(P, win)
    tw = timeit(run_win, img, uv) / ITERS * 1000
    print(f"{label} N={N} P={P}:")
    print(f"  packed 4-vec taps  : {t_packed:7.3f} ms/iter")
    print(f"  row-segment gather : {t_rows:7.3f} ms/iter")
    print(f"  cached win resample: {tw:7.3f} ms/iter (win={win})")

# one-off window gather cost (amortized): how much does the cache cost?
N, P, WIN = 960, 4, 12
uv = make_uv(N)

@jax.jit
def win_only(img, uv):
    def body(carry, _):
        uv = carry
        anchor = jnp.floor(uv).astype(jnp.int32) - WIN // 2 + 1
        ay = jnp.clip(anchor[:, 1], 0, H - WIN)
        ax = jnp.clip(anchor[:, 0], 0, W - WIN)
        wins = jax.vmap(lambda y, x: jax.lax.dynamic_slice(img, (y, x), (WIN, WIN)),
                        in_axes=(0, 0))(ay, ax)
        return uv + jnp.sum(wins, axis=(1, 2))[:, None] * 1e-9, ()
    uv2, _ = jax.lax.scan(body, uv, None, length=ITERS)
    return uv2

print(f"window-gather-only (N=960, 12x12): {timeit(win_only, img, uv)/ITERS*1000:7.3f} ms/iter")
