"""Microbench: patch-gather strategies for the GN inner loops.

Strategies:
  A. current: bilinear_sample of N*P positions (4 taps each) per iteration
  B. window gather per feature (vmapped dynamic_slice) + dense resample
  C. window gather once + K dense-resample iterations (window cached)

Run on the real TPU to pick the design.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_default_matmul_precision", "highest")

H, W = 480, 752
N = 944          # patch units (points + line samples)
PS = 4           # patch size
WIN = 16         # window size
ITERS = 30

rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
uv = jnp.asarray(
    np.stack([rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)], -1),
    jnp.float32)


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# ---- A: current per-iteration bilinear gather ----
from plsvo_tpu.image import patch_offsets, bilinear_sample


@jax.jit
def strat_a(img, uv):
    offs = patch_offsets(PS)
    def body(carry, _):
        uv = carry
        pos = uv[:, None, :] + offs
        I, ok = bilinear_sample(img, pos)
        uv = uv + 0.01 * jnp.sum(I, -1, keepdims=True) * 1e-6
        return uv, jnp.sum(I)
    uv, s = jax.lax.scan(body, uv, None, length=ITERS)
    return uv, s


# ---- B/C: window gather + dense resample ----
def gather_windows(img, uv, win):
    """Integer-anchored windows (N, win, win) centered-ish on uv."""
    anchor = jnp.floor(uv).astype(jnp.int32) - win // 2 + 1
    ay = jnp.clip(anchor[:, 1], 0, H - win)
    ax = jnp.clip(anchor[:, 0], 0, W - win)
    def slc(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (win, win))
    return jax.vmap(slc)(ay, ax), ax, ay


def resample(windows, rel_uv, patch_size):
    """Sample patch at fractional rel position inside windows via 2 matmuls.
    rel_uv: (N,2) patch-center position in window coords."""
    n = windows.shape[0]
    half = patch_size / 2.0
    r = jnp.arange(patch_size, dtype=jnp.float32) - half + 0.5
    a = jnp.arange(WIN, dtype=jnp.float32)
    # y weights: (N, PS, WIN)
    ys = rel_uv[:, 1:2, None] + r[None, :, None]          # (N,PS,1)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys - a[None, None, :]))
    xs = rel_uv[:, 0:1, None] + r[None, :, None]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - a[None, None, :]))
    # patch = wy @ W @ wx^T
    t = jnp.einsum("nia,nab->nib", wy, windows)
    return jnp.einsum("nib,njb->nij", t, wx)


@jax.jit
def strat_b(img, uv):
    def body(carry, _):
        uv = carry
        wins, ax, ay = gather_windows(img, uv, WIN)
        rel = uv - jnp.stack([ax, ay], -1).astype(jnp.float32)
        P = resample(wins, rel, PS)
        uv = uv + 0.01 * jnp.sum(P, (-1, -2), keepdims=False)[:, None] * 1e-6
        return uv, jnp.sum(P)
    uv2, s = jax.lax.scan(body, uv, None, length=ITERS)
    return uv2, s


@jax.jit
def strat_c(img, uv):
    wins, ax, ay = gather_windows(img, uv, WIN)
    org = jnp.stack([ax, ay], -1).astype(jnp.float32)
    def body(carry, _):
        uv = carry
        rel = uv - org
        P = resample(wins, rel, PS)
        uv = uv + 0.01 * jnp.sum(P, (-1, -2))[:, None] * 1e-6
        return uv, jnp.sum(P)
    uv2, s = jax.lax.scan(body, uv, None, length=ITERS)
    return uv2, s


# correctness: B patch == A patch at same positions?
offs = patch_offsets(PS)
pos = uv[:, None, :] + offs
ref, _ = bilinear_sample(img, pos)
wins, ax, ay = gather_windows(img, uv, WIN)
rel = uv - jnp.stack([ax, ay], -1).astype(jnp.float32)
got = resample(wins, rel, PS).reshape(N, -1)
err = float(jnp.max(jnp.abs(ref - got)))
print(f"resample max err vs bilinear_sample: {err:.2e}")

ta = timeit(strat_a, img, uv)
tb = timeit(strat_b, img, uv)
tc = timeit(strat_c, img, uv)
print(f"A per-iter bilinear gather : {ta*1000:8.2f} ms ({ITERS} iters)")
print(f"B per-iter window+resample : {tb*1000:8.2f} ms")
print(f"C cached window, dense loop: {tc*1000:8.2f} ms")

# single gather pass costs
f_gather = jax.jit(lambda img, uv: bilinear_sample(img, uv[:, None, :] + offs)[0])
f_win = jax.jit(lambda img, uv: gather_windows(img, uv, WIN)[0])
print(f"one bilinear patch pass    : {timeit(f_gather, img, uv)*1000:8.2f} ms")
print(f"one window gather pass     : {timeit(f_win, img, uv)*1000:8.2f} ms")

# dispatch+fetch latency over the tunnel
f_triv = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128))
t = timeit(lambda a: jax.device_get(f_triv(a)), x, n=50)
print(f"trivial dispatch+fetch     : {t*1000:8.2f} ms")
