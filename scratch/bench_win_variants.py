"""Isolate sparse-align prefix costs: slice-gather vs block-gather on
small level images; _patch_and_grad variants."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plsvo_tpu.image import (gather_windows_raw, pack_bilinear,
                             sample_patch_windows, patch_offsets)


def timeit(f, *args, n=4):
    def scanify(iters):
        @jax.jit
        def run():
            def body(c, _):
                out = f(*jax.tree.map(
                    lambda a: a + c if jnp.issubdtype(a.dtype, jnp.floating)
                    else a, args))
                leaves = [l for l in jax.tree.leaves(out)
                          if jnp.issubdtype(l.dtype, jnp.floating)]
                return c + sum(jnp.sum(l) for l in leaves) * 1e-30, ()
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


def old_block_gather(img, uv_center, wp):
    H, W = img.shape
    pad = wp
    padded = jnp.pad(img, ((pad, pad), (pad, pad)))
    packed = pack_bilinear(padded)
    corner = jnp.floor(uv_center - (wp / 2.0 - 1.0))
    ci = corner.astype(jnp.int32) + pad
    nb = wp // 2
    bj = jnp.arange(nb, dtype=jnp.int32) * 2
    gu = ci[:, 0:1] + bj[None]
    gv = ci[:, 1:2] + bj[None]
    blocks = packed[gv[:, :, None], gu[:, None, :]]
    N = blocks.shape[0]
    win = (blocks.reshape(N, nb, nb, 2, 2)
           .transpose(0, 1, 3, 2, 4).reshape(N, wp, wp))
    return win, corner


def new_slice_gather(img, uv_center, wp):
    H, W = img.shape
    corner = jnp.floor(uv_center - (wp / 2.0 - 1.0))
    ci = corner.astype(jnp.int32)
    cu = jnp.clip(ci[:, 0], 0, max(W - wp, 0))
    cv = jnp.clip(ci[:, 1], 0, max(H - wp, 0))
    win = gather_windows_raw(img, jnp.stack([cu, cv], -1), wp)
    return win, jnp.stack([cu, cv], -1).astype(uv_center.dtype)


rng = np.random.default_rng(0)
U = 960
for (H, W, tag) in [(120, 188, "L2"), (60, 94, "L3"), (30, 47, "L4")]:
    img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    uv = jnp.asarray(np.stack([rng.uniform(8, W - 8, U),
                               rng.uniform(8, H - 8, U)], -1), jnp.float32)
    t_old = timeit(lambda i, u: old_block_gather(i, u, 12), img, uv)
    t_new = timeit(lambda i, u: new_slice_gather(i, u, 12), img, uv)
    print(f"[{tag} {H}x{W}] block {t_old:7.3f} ms | slice {t_new:7.3f} ms",
          flush=True)

# _patch_and_grad variants at L2
from plsvo_tpu.ops.sparse_align import _patch_and_grad

img = jnp.asarray(rng.standard_normal((120, 188)), jnp.float32)
uv = jnp.asarray(np.stack([rng.uniform(8, 180, U),
                           rng.uniform(8, 112, U)], -1), jnp.float32)
print(f"_patch_and_grad NEW        : "
      f"{timeit(lambda i, u: _patch_and_grad(i, u, 4), img, uv):7.3f} ms",
      flush=True)


def pag_stacked(img, centers, patch_size):
    """Variant: one sample_patch_windows over stacked [win,dxw,dyw]."""
    from plsvo_tpu.image import gather_patch_windows
    H, W = img.shape
    P = patch_size
    wp = P + 6
    wp += wp % 2
    win, corner = gather_patch_windows(img, centers, wp)
    dxw = jnp.pad(0.5 * (win[:, :, 2:] - win[:, :, :-2]),
                  ((0, 0), (0, 0), (1, 1)))
    dyw = jnp.pad(0.5 * (win[:, 2:, :] - win[:, :-2, :]),
                  ((0, 0), (1, 1), (0, 0)))
    w3 = jnp.concatenate([win, dxw, dyw])  # (3N, wp, wp)
    c3 = jnp.tile(corner, (3, 1))
    u3 = jnp.tile(centers, (3, 1))
    vals, ok3 = sample_patch_windows(w3, c3, u3, P)
    N = centers.shape[0]
    I, dx, dy = vals[:N], vals[N:2 * N], vals[2 * N:]
    first = centers - (P / 2.0 - 0.5)
    au0 = jnp.floor(first[..., 0])
    av0 = jnp.floor(first[..., 1])
    valid = (ok3[:N] & (au0 >= 1) & (av0 >= 1)
             & (au0 + P <= W - 2) & (av0 + P <= H - 2))
    return I, dx, dy, valid


print(f"_patch_and_grad stacked    : "
      f"{timeit(lambda i, u: pag_stacked(i, u, 4), img, uv):7.3f} ms",
      flush=True)


def old_pag(img, centers, patch_size):
    from plsvo_tpu.image import (bilinear_sample_multi, gradient,
                                 pack_bilinear_multi)
    offs = patch_offsets(patch_size, centers.dtype)
    pos = centers[..., None, :] + offs
    dx_map, dy_map = gradient(img)
    packed = pack_bilinear_multi([img, dx_map, dy_map])
    vals, ok = bilinear_sample_multi(packed, pos)
    valid = jnp.all(ok, axis=-1)
    return vals[..., 0], vals[..., 1], vals[..., 2], valid


print(f"_patch_and_grad OLD        : "
      f"{timeit(lambda i, u: old_pag(i, u, 4), img, uv):7.3f} ms",
      flush=True)
