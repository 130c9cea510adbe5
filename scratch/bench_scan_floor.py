"""Per-iteration floor cost of lax.scan bodies of increasing size."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 384
P = 8
WP = 18
S = WP - P
ITERS = 50
rng = np.random.default_rng(0)
win = jnp.asarray(rng.standard_normal((N, WP, WP)), jnp.float32)
uv0 = jnp.asarray(rng.uniform(2, 4, (N, 2)), jnp.float32)
drifts = jnp.asarray(rng.uniform(-0.05, 0.05, (ITERS, N, 2)), jnp.float32)


def timeit(fn, *args, n=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n / ITERS * 1e6


@jax.jit
def empty_scan(uv0, drifts):
    def body(c, d):
        return c + jnp.sum(d) * 1e-9, jnp.sum(d)
    return jax.lax.scan(body, jnp.zeros(()), drifts)


@jax.jit
def elemwise_scan(win, uv0, drifts):
    def body(c, d):
        x = win * (1.0 + jnp.sum(d) * 1e-9)  # one pass over 124k elems
        return c + jnp.sum(x) * 1e-9, jnp.sum(d)
    return jax.lax.scan(body, jnp.zeros(()), drifts)


@jax.jit
def interp_scan(win, uv0, drifts):
    cand_v = jnp.stack([win[:, s:s + P + 1, :] for s in range(S)])
    shifts = jnp.arange(S, dtype=jnp.float32)

    def body(carry, d):
        acc, uv = carry
        uvn = uv + d
        i0 = jnp.floor(uvn)
        f = uvn - i0
        oh_v = (shifts[:, None] == i0[None, :, 1]).astype(jnp.float32)
        sel_v = jnp.sum(oh_v[:, :, None, None] * cand_v, axis=0)
        fv = f[:, 1][:, None, None]
        rows = (1 - fv) * sel_v[:, :P, :] + fv * sel_v[:, 1:, :]
        cand_u = jnp.stack([rows[:, :, s:s + P + 1] for s in range(S)])
        oh_u = (shifts[:, None] == i0[None, :, 0]).astype(jnp.float32)
        sel_u = jnp.sum(oh_u[:, :, None, None] * cand_u, axis=0)
        fu = f[:, 0][:, None, None]
        patch = (1 - fu) * sel_u[:, :, :P] + fu * sel_u[:, :, 1:]
        return (acc + jnp.sum(patch) * 1e-9, uvn), jnp.sum(patch)
    return jax.lax.scan(body, (jnp.zeros(()), uv0), drifts)


print(f"empty scan    : {timeit(empty_scan, uv0, drifts):7.1f} us/iter")
print(f"elemwise 124k : {timeit(elemwise_scan, win, uv0, drifts):7.1f} us/iter")
print(f"window interp : {timeit(interp_scan, win, uv0, drifts):7.1f} us/iter")
