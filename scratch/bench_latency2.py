"""Clean per-pattern latency measurement, each pattern isolated."""
import time
import numpy as np
import jax
import jax.numpy as jnp

f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128))
jax.block_until_ready(jax.device_get(f(x)))

def t(fn, n=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000

# the real pattern: dispatch then immediately fetch result
print(f"dispatch->device_get       : {t(lambda: jax.device_get(f(x))):8.2f} ms", flush=True)
# dispatch, block, fetch
def dbf():
    y = f(x)
    jax.block_until_ready(y)
    return jax.device_get(y)
print(f"dispatch->block->get       : {t(dbf):8.2f} ms", flush=True)
# upload->dispatch->fetch (the frame pattern)
h = np.zeros((192, 8), np.float32)
def udf():
    a = jnp.asarray(h)
    return jax.device_get(f2(a))
f2 = jax.jit(lambda a: a * 2.0)
jax.device_get(f2(jnp.asarray(h)))
print(f"upload->dispatch->get      : {t(udf):8.2f} ms", flush=True)
# 20 uploads -> 1 dispatch -> 1 get
hs = [np.zeros((64, 4), np.float32) for _ in range(20)]
f3 = jax.jit(lambda *a: sum(jnp.sum(q) for q in a))
jax.device_get(f3(*[jnp.asarray(q) for q in hs]))
def many_up():
    return jax.device_get(f3(*[jnp.asarray(q) for q in hs]))
print(f"20 uploads->dispatch->get  : {t(many_up):8.2f} ms", flush=True)
# 2 sequential dispatch+get cycles
def two_cycles():
    a = jax.device_get(f(x))
    b = jax.device_get(f(x))
    return b
print(f"2x (dispatch->get)         : {t(two_cycles):8.2f} ms", flush=True)
