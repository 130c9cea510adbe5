"""True per-iteration device cost by ITERS-slope: t(500)-t(50) / 450.
Removes the variable per-call tunnel sync from the measurement."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.image import bilinear_sample, pack_bilinear, patch_offsets

H, W = 480, 1400
N = 384
P = 8
MARGIN = 4
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
uv0 = jnp.asarray(
    np.stack([rng.uniform(20, W - 30, N), rng.uniform(20, H - 30, N)], -1),
    jnp.float32)
offs = patch_offsets(P, jnp.float32)
WP = P + 1 + 2 * MARGIN
WP += WP % 2
NB = WP // 2
S = WP - P


@partial(jax.jit, static_argnames=("iters",))
def baseline(img, uv0, *, iters):
    packed = pack_bilinear(img)

    def body(carry, _):
        acc, uv = carry
        pos = uv[:, None, :] + offs[None]
        vals, ok = bilinear_sample(packed, pos)
        uvn = uv + jnp.mean(vals, 1, keepdims=True)[:, :1] * 1e-9
        return (acc + jnp.sum(vals) * 1e-9, uvn), ()
    (acc, _), _ = jax.lax.scan(body, (jnp.zeros(()), uv0), None, length=iters)
    return acc


@partial(jax.jit, static_argnames=("iters",))
def windowed(img, uv0, *, iters):
    packed = pack_bilinear(img)
    corner = jnp.floor(uv0 - (WP / 2.0 - 1.0)).astype(jnp.int32)
    bj = jnp.arange(NB) * 2
    gu = jnp.clip(corner[:, 0:1] + bj[None], 0, W - 2)
    gv = jnp.clip(corner[:, 1:2] + bj[None], 0, H - 2)
    blocks = packed[gv[:, :, None], gu[:, None, :]]
    win = jnp.zeros((N, WP, WP), jnp.float32)
    win = win.at[:, 0::2, 0::2].set(blocks[..., 0])
    win = win.at[:, 0::2, 1::2].set(blocks[..., 1])
    win = win.at[:, 1::2, 0::2].set(blocks[..., 2])
    win = win.at[:, 1::2, 1::2].set(blocks[..., 3])
    cf = corner.astype(jnp.float32)
    cand_v = jnp.stack([win[:, s:s + P + 1, :] for s in range(S)])
    shifts = jnp.arange(S, dtype=jnp.float32)

    def body(carry, _):
        acc, uv = carry
        t0 = uv - (P / 2.0 - 0.5) - cf
        i0 = jnp.floor(t0)
        f = t0 - i0
        oh_v = (shifts[:, None] == i0[None, :, 1]).astype(jnp.float32)
        sel_v = jnp.sum(oh_v[:, :, None, None] * cand_v, axis=0)
        fv = f[:, 1][:, None, None]
        rows = (1 - fv) * sel_v[:, :P, :] + fv * sel_v[:, 1:, :]
        cand_u = jnp.stack([rows[:, :, s:s + P + 1] for s in range(S)])
        oh_u = (shifts[:, None] == i0[None, :, 0]).astype(jnp.float32)
        sel_u = jnp.sum(oh_u[:, :, None, None] * cand_u, axis=0)
        fu = f[:, 0][:, None, None]
        patch = (1 - fu) * sel_u[:, :, :P] + fu * sel_u[:, :, 1:]
        uvn = uv + jnp.mean(patch, (1, 2), keepdims=False)[:, None] * 1e-9
        return (acc + jnp.sum(patch) * 1e-9, uvn), ()
    (acc, _), _ = jax.lax.scan(body, (jnp.zeros(()), uv0), None, length=iters)
    return acc


def t(fn, iters, n=8):
    out = fn(img, uv0, iters=iters)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(img, uv0, iters=iters)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


for name, fn in [("baseline", baseline), ("windowed", windowed)]:
    t50 = t(fn, 50)
    t500 = t(fn, 500)
    slope = (t500 - t50) / 450 * 1e6
    print(f"{name}: {slope:7.1f} us/iter  (t50={t50*1e3:.1f}ms t500={t500*1e3:.1f}ms)")
