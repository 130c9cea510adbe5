"""Does vmapping the align core over B sequences amortize the fixed costs?"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_default_matmul_precision", "highest")

from plsvo_tpu.config import Config
from plsvo_tpu.image import build_pyramid
from plsvo_tpu.ops import sparse_align

cfg = Config()
caps = cfg.caps
W, H = 752, 480
fx = fy = jnp.asarray(460.0)
cx = jnp.asarray(W / 2.0)
cy = jnp.asarray(H / 2.0)
rng = np.random.default_rng(0)


def t(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(jax.device_get(out))
    return (time.perf_counter() - t0) / n * 1000


F, G, S = caps.max_fts, caps.max_segs, caps.n_line_samples

def mk_inputs(B):
    img = jnp.asarray(rng.uniform(0, 255, (B, H, W)), jnp.float32)
    pyr = [jax.vmap(lambda im: im)(p) for p in
           [img] + []]
    # build pyramids batched
    def bp(im):
        return tuple(build_pyramid(im, 5))
    pyr = jax.vmap(bp)(img)
    pyr2 = jax.vmap(bp)(img + 1.0)
    uv = np.stack([rng.uniform(30, W - 30, (B, F)), rng.uniform(30, H - 30, (B, F))], -1).astype(np.float32)
    f = np.concatenate([(uv - [W/2, H/2]) / 460.0, np.ones((B, F, 1))], -1).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    pts = sparse_align.AlignPoints(
        xyz_ref=jnp.asarray(f * 2.0), uv_ref=jnp.asarray(uv),
        valid=jnp.asarray(np.tile(np.arange(F) < 120, (B, 1))))
    suv = np.stack([rng.uniform(40, W - 80, (B, G)), rng.uniform(40, H - 80, (B, G))], -1).astype(np.float32)
    euv = suv + rng.uniform(20, 60, (B, G, 2)).astype(np.float32)
    sf = np.concatenate([(suv - [W/2, H/2]) / 460.0, np.ones((B, G, 1))], -1).astype(np.float32)
    sf /= np.linalg.norm(sf, axis=-1, keepdims=True)
    ef = np.concatenate([(euv - [W/2, H/2]) / 460.0, np.ones((B, G, 1))], -1).astype(np.float32)
    ef /= np.linalg.norm(ef, axis=-1, keepdims=True)
    mk = jax.vmap(partial(sparse_align.make_align_segments, n_samples=S,
                          fx=fx, fy=fy, cx=cx, cy=cy))
    segs = mk(jnp.asarray(suv), jnp.asarray(euv), jnp.asarray(sf), jnp.asarray(ef),
              jnp.full((B, G), 2.0), jnp.full((B, G), 2.0),
              jnp.asarray(np.tile(np.arange(G) < 16, (B, 1))))
    R0 = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
    t0_ = jnp.zeros((B, 3))
    return pyr, pyr2, pts, segs, R0, t0_


core = partial(sparse_align.sparse_img_align, fx=fx, fy=fy, cx=cx, cy=cy,
               levels=(4, 3, 2), n_iter=30)
for B in (1, 4, 8, 16):
    pyr, pyr2, pts, segs, R0, t0_ = mk_inputs(B)
    fn = jax.jit(jax.vmap(lambda pr, pc, p, s, R, tt: core(pr, pc, p, s, R, tt)))
    ms = t(fn, pyr, pyr2, pts, segs, R0, t0_)
    print(f"B={B:3d}: {ms:8.1f} ms total  {ms/B:7.2f} ms/seq")

# iteration scaling at B=1: is per-iteration overhead dominant?
pyr, pyr2, pts, segs, R0, t0_ = mk_inputs(1)
sq = jax.tree.map(lambda a: a[0] if hasattr(a, 'shape') and a.ndim and a.shape[0] == 1 else a, (pyr, pyr2, pts, segs))
p1, p2, pt1, sg1 = sq
for it in (2, 5, 10, 30):
    fn = partial(sparse_align.sparse_img_align, fx=fx, fy=fy, cx=cx, cy=cy,
                 levels=(4, 3, 2), n_iter=it)
    ms = t(fn, p1, p2, pt1, sg1, jnp.eye(3), jnp.zeros(3))
    print(f"n_iter={it:3d}: {ms:8.1f} ms")
