"""Gather variants round 2: flat 1-D row-segment gathers + u8 textures."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

H, W = 480, 752
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
ITERS = 100


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


from plsvo_tpu.image import patch_offsets, bilinear_sample, pack_bilinear


def make_uv(N):
    return jnp.asarray(np.stack([rng.uniform(20, W - 20, N),
                                 rng.uniform(20, H - 20, N)], -1), jnp.float32)


def scan_probe(fn_one_iter, uv, img):
    @jax.jit
    def run(img, uv):
        def body(carry, _):
            uv = carry
            s = fn_one_iter(img, uv)
            uv = uv + s * 1e-9
            return uv, ()
        uv2, _ = jax.lax.scan(body, uv, None, length=ITERS)
        return uv2
    return timeit(run, img, uv) / ITERS * 1000


def probe_packed(P, dtype):
    offs = patch_offsets(P)
    packed = pack_bilinear(img).astype(dtype)
    def one(pk, uv):
        pos = uv[:, None, :] + offs
        I, ok = bilinear_sample(pk.astype(jnp.float32) if False else pk, pos)
        return jnp.sum(I.astype(jnp.float32), axis=-1, keepdims=True) * jnp.ones((1, 2))
    return one, packed


def probe_flat_rows(P, seg, dtype):
    """Whole-patch gather as (P+1) 1-D contiguous segments of `seg` floats
    from the flattened image; bilinear lerp in-register."""
    flat = img.astype(dtype).ravel()
    S = P + 1
    def one(flat, uv):
        u0f = jnp.floor(uv[:, 0] - P / 2.0 + 0.5)
        v0f = jnp.floor(uv[:, 1] - P / 2.0 + 0.5)
        fu = (uv[:, 0] - P / 2.0 + 0.5) - u0f
        fv = (uv[:, 1] - P / 2.0 + 0.5) - v0f
        u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - seg)
        v0 = jnp.clip(v0f.astype(jnp.int32), 0, H - S - 1)
        rows = v0[:, None] + jnp.arange(S + 1)[None, :]  # (N,S+1)
        starts = rows * W + u0[:, None]  # (N,S+1)
        segs = jax.vmap(
            jax.vmap(lambda s: jax.lax.dynamic_slice(flat, (s,), (seg,))))(
                starts)  # (N,S+1,seg)
        segs = segs.astype(jnp.float32)
        wl = (1.0 - fu)[:, None, None]
        horiz = wl * segs[:, :, :S] + (1 - wl) * segs[:, :, 1:S + 1]
        vl = (1.0 - fv)[:, None, None]
        patch = vl * horiz[:, :S, :] + (1 - vl) * horiz[:, 1:S + 1, :]
        return jnp.sum(patch, axis=(1, 2))[:, None] * jnp.ones((1, 2))
    return one, flat


for (label, N, P) in [("align", 960, 4), ("align2d", 384, 8)]:
    uv = make_uv(N)
    one, pk = probe_packed(P, jnp.float32)
    t1 = scan_probe(one, uv, pk)
    one8, pk8 = probe_packed(P, jnp.uint8)
    t2 = scan_probe(one8, uv, pk8)
    onef, fl = probe_flat_rows(P, 8 if P == 4 else 16, jnp.float32)
    t3 = scan_probe(onef, uv, fl)
    onef8, fl8 = probe_flat_rows(P, 8 if P == 4 else 16, jnp.uint8)
    t4 = scan_probe(onef8, uv, fl8)
    print(f"{label} N={N} P={P}:")
    print(f"  packed f32 4-vec taps : {t1:7.3f} ms/iter")
    print(f"  packed u8  4-vec taps : {t2:7.3f} ms/iter")
    print(f"  flat-row f32 segments : {t3:7.3f} ms/iter")
    print(f"  flat-row u8  segments : {t4:7.3f} ms/iter")
