"""Prototype: gather-free GN iterations for align2d.

Prefetch a (Wp,Wp) raw-intensity window per feature ONCE (packed-4 gathers
on a 2x2-block grid), then every iteration resamples the 8x8 patch from the
window with two one-hot banded einsums (no gather). Compare speed + numerics
vs the per-iteration global-gather loop."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.image import bilinear_sample, pack_bilinear, patch_offsets

H, W = 480, 1400
N = 384
P = 8
MARGIN = 4  # px of drift allowed from the prefetch center
ITERS = 50  # amortize the tunnel sync
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
uv0 = jnp.asarray(
    np.stack([rng.uniform(20, W - 30, N), rng.uniform(20, H - 30, N)], -1),
    jnp.float32)
# per-iteration drifts (simulate GN updates)
drifts = jnp.asarray(rng.uniform(-0.05, 0.05, (ITERS, N, 2)), jnp.float32)

offs = patch_offsets(P, jnp.float32)

# window geometry: first patch tap at uv - (P/2-0.5); window must cover
# [uv0 - margin - (P/2-0.5), uv0 + margin + (P/2-0.5) + 1]
WP = P + 1 + 2 * MARGIN  # 17
WP += WP % 2  # even for the 2x2 block grid -> 18
NB = WP // 2  # blocks per side


@jax.jit
def baseline(img, uv0, drifts):
    packed = pack_bilinear(img)

    def body(carry, d):
        acc, uv = carry
        pos = (uv + d)[:, None, :] + offs[None]
        vals, ok = bilinear_sample(packed, pos)
        return (acc + jnp.sum(vals) * 1e-9, uv + d), jnp.sum(vals, 0)
    (acc, _), patches = jax.lax.scan(body, (jnp.zeros(()), uv0), drifts)
    return acc, patches


@jax.jit
def windowed(img, uv0, drifts):
    packed = pack_bilinear(img)
    # window anchor: integer corner so uv0 sits at the center
    corner = jnp.floor(uv0 - (WP / 2.0 - 1.0)).astype(jnp.int32)  # (N,2) u,v
    # 2x2 block grid gather
    bj = jnp.arange(NB) * 2
    gu = corner[:, 0:1] + bj[None]  # (N,NB)
    gv = corner[:, 1:2] + bj[None]
    guc = jnp.clip(gu, 0, W - 2)
    gvc = jnp.clip(gv, 0, H - 2)
    blocks = packed[gvc[:, :, None], guc[:, None, :]]  # (N,NB,NB,4)
    win = jnp.zeros((N, WP, WP), jnp.float32)
    win = win.at[:, 0::2, 0::2].set(blocks[..., 0])
    win = win.at[:, 0::2, 1::2].set(blocks[..., 1])
    win = win.at[:, 1::2, 0::2].set(blocks[..., 2])
    win = win.at[:, 1::2, 1::2].set(blocks[..., 3])

    cf = corner.astype(jnp.float32)
    jw = jnp.arange(WP, dtype=jnp.float32)

    S = WP - P  # number of possible integer shifts (v and u)
    cand_v = jnp.stack([win[:, s:s + P + 1, :] for s in range(S)])  # (S,N,P+1,WP)
    shifts = jnp.arange(S, dtype=jnp.float32)

    def body(carry, d):
        acc, uv = carry
        uvn = uv + d
        # first-tap position within window coords
        t0 = uvn - (P / 2.0 - 0.5) - cf  # (N,2) float window coords
        i0 = jnp.floor(t0)
        f = t0 - i0  # (N,2)
        oh_v = (shifts[:, None] == i0[None, :, 1]).astype(jnp.float32)  # (S,N)
        sel_v = jnp.sum(oh_v[:, :, None, None] * cand_v, axis=0)  # (N,P+1,WP)
        fv = f[:, 1][:, None, None]
        rows = (1 - fv) * sel_v[:, :P, :] + fv * sel_v[:, 1:, :]  # (N,P,WP)
        cand_u = jnp.stack([rows[:, :, s:s + P + 1] for s in range(S)])  # (S,N,P,P+1)
        oh_u = (shifts[:, None] == i0[None, :, 0]).astype(jnp.float32)
        sel_u = jnp.sum(oh_u[:, :, None, None] * cand_u, axis=0)  # (N,P,P+1)
        fu = f[:, 0][:, None, None]
        patch = (1 - fu) * sel_u[:, :, :P] + fu * sel_u[:, :, 1:]  # (N,P,P)
        vals = patch.reshape(N, P * P)
        return (acc + jnp.sum(vals) * 1e-9, uvn), jnp.sum(vals, 0)
    (acc, _), patches = jax.lax.scan(body, (jnp.zeros(()), uv0), drifts)
    return acc, patches


def timeit(fn, *args, n=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


a1, p1 = baseline(img, uv0, drifts)
a2, p2 = windowed(img, uv0, drifts)
# patch layout differs: baseline uses patch_offsets order (row-major v,u)
err = jnp.max(jnp.abs(p1 - p2.reshape(ITERS, P * P)))
print("max abs err:", float(err))
t1 = timeit(baseline, img, uv0, drifts)
t2 = timeit(windowed, img, uv0, drifts)
print(f"baseline per-iter gather: {t1/ITERS*1000:7.1f} us/iter ({ITERS} iters)")
print(f"windowed prefetch+einsum: {t2/ITERS*1000:7.1f} us/iter")
