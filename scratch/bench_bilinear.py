"""Head-to-head: bilinear gather strategies at epipolar-search scale.

N = 172k positions on a 480x752 image (the depth-filter epipolar workload).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 480, 752
N = 172032  # multiple of tile

rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
pos = jnp.asarray(
    np.stack([rng.uniform(1, W - 2, N), rng.uniform(1, H - 2, N)], -1),
    jnp.float32)


def timeit(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# ---- A: current (4 advanced-indexing gathers) ----
from plsvo_tpu.image import bilinear_sample
f_a = jax.jit(lambda img, p: bilinear_sample(img, p)[0])

# ---- B: packed 4-neighbor image + single gather of 4-vectors ----
@jax.jit
def f_b(img, p):
    i01 = jnp.roll(img, -1, axis=1)
    i10 = jnp.roll(img, -1, axis=0)
    i11 = jnp.roll(i10, -1, axis=1)
    packed = jnp.stack([img, i01, i10, i11], -1)  # (H,W,4)
    u = p[:, 0]; v = p[:, 1]
    u0 = jnp.floor(u); v0 = jnp.floor(v)
    fu = (u - u0)[:, None]; fv = (v - v0)[:, None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 2)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 2)
    taps = packed[v0i, u0i]  # (N,4)
    w = jnp.concatenate([(1 - fu) * (1 - fv), fu * (1 - fv),
                         (1 - fu) * fv, fu * fv], -1)
    return jnp.sum(taps * w, -1)

# pre-packed variant (pack once per frame, amortized)
packed_const = jax.block_until_ready(jax.jit(
    lambda img: jnp.stack([img, jnp.roll(img, -1, 1), jnp.roll(img, -1, 0),
                           jnp.roll(jnp.roll(img, -1, 0), -1, 1)], -1))(img))
@jax.jit
def f_b2(packed, p):
    u = p[:, 0]; v = p[:, 1]
    u0 = jnp.floor(u); v0 = jnp.floor(v)
    fu = (u - u0)[:, None]; fv = (v - v0)[:, None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 2)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 2)
    taps = packed[v0i, u0i]
    w = jnp.concatenate([(1 - fu) * (1 - fv), fu * (1 - fv),
                         (1 - fu) * fv, fu * fv], -1)
    return jnp.sum(taps * w, -1)

# ---- C: vmapped dynamic_slice (2,2) ----
@jax.jit
def f_c(img, p):
    u0 = jnp.clip(jnp.floor(p[:, 0]).astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(jnp.floor(p[:, 1]).astype(jnp.int32), 0, H - 2)
    fu = p[:, 0] - u0; fv = p[:, 1] - v0
    sl = jax.vmap(lambda y, x: jax.lax.dynamic_slice(img, (y, x), (2, 2)))(v0, u0)
    w00 = (1 - fu) * (1 - fv); w01 = fu * (1 - fv)
    w10 = (1 - fu) * fv; w11 = fu * fv
    return (sl[:, 0, 0] * w00 + sl[:, 0, 1] * w01
            + sl[:, 1, 0] * w10 + sl[:, 1, 1] * w11)

# ---- D: Pallas scalar-loop kernel ----
TILE = 2048

def _kernel(img_ref, pos_ref, out_ref, acc_ref):
    p = pos_ref[...]
    u = p[:, 0]
    v = p[:, 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 2)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 2)
    w00 = (1 - fu) * (1 - fv)
    w01 = fu * (1 - fv)
    w10 = (1 - fu) * fv
    w11 = fu * fv
    acc_ref[0, :] = w00
    acc_ref[1, :] = w01
    acc_ref[2, :] = w10
    acc_ref[3, :] = w11
    acc_ref[4, :] = u0i.astype(jnp.float32)
    acc_ref[5, :] = v0i.astype(jnp.float32)

    def body(i, _):
        ui = acc_ref[4, i].astype(jnp.int32)
        vi = acc_ref[5, i].astype(jnp.int32)
        t00 = img_ref[vi, ui]
        t01 = img_ref[vi, ui + 1]
        t10 = img_ref[vi + 1, ui]
        t11 = img_ref[vi + 1, ui + 1]
        out_ref[i] = (acc_ref[0, i] * t00 + acc_ref[1, i] * t01
                      + acc_ref[2, i] * t10 + acc_ref[3, i] * t11)
        return 0
    jax.lax.fori_loop(0, TILE, body, 0)

@jax.jit
def f_d(img, p):
    n = p.shape[0]
    return pl.pallas_call(
        _kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6, TILE), jnp.float32)],
    )(img, p)


ref = np.asarray(f_a(img, pos))
for name, fn, args in [("A 4x adv-index gather", f_a, (img, pos)),
                       ("B pack+1 gather      ", f_b, (img, pos)),
                       ("B2 prepacked gather  ", f_b2, (packed_const, pos)),
                       ("C vmap dyn_slice 2x2 ", f_c, (img, pos)),
                       ("D pallas scalar loop ", f_d, (img, pos))]:
    try:
        got = np.asarray(fn(*args))
        err = float(np.max(np.abs(got - ref)))
        t = timeit(fn, *args)
        print(f"{name}: {t*1000:8.2f} ms   err={err:.2e}  ({t/N*1e9:.1f} ns/pos)")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
