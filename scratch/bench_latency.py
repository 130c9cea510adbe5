"""Decompose tunnel latency: dispatch vs fetch vs upload."""
import time
import numpy as np
import jax
import jax.numpy as jnp

f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128))
jax.block_until_ready(f(x))

def t(fn, n=30):
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000

# dispatch+block (no host fetch)
print(f"dispatch+block_until_ready : {t(lambda: jax.block_until_ready(f(x))):8.2f} ms")
# dispatch+device_get
print(f"dispatch+device_get        : {t(lambda: jax.device_get(f(x))):8.2f} ms")
# chained dispatches then one block
def chain(k):
    y = x
    for _ in range(k):
        y = f(y)
    jax.block_until_ready(y)
print(f"10 chained dispatch+1 block: {t(lambda: chain(10)):8.2f} ms")
# upload small
h = np.zeros((8, 128), np.float32)
print(f"upload 4KB + block         : {t(lambda: jax.block_until_ready(jnp.asarray(h))):8.2f} ms")
big = np.zeros((480, 752), np.float32)
print(f"upload 1.4MB + block       : {t(lambda: jax.block_until_ready(jnp.asarray(big))):8.2f} ms")
bigu8 = np.zeros((480, 752), np.uint8)
print(f"upload 360KB u8 + block    : {t(lambda: jax.block_until_ready(jnp.asarray(bigu8))):8.2f} ms")
# fetch sizes
y = jax.block_until_ready(f(x))
print(f"device_get 4KB             : {t(lambda: jax.device_get(y)):8.2f} ms")
yb = jax.block_until_ready(jnp.zeros((480, 752)))
print(f"device_get 1.4MB           : {t(lambda: jax.device_get(yb)):8.2f} ms")
# many small fetches
ys = [jax.block_until_ready(jnp.zeros((8,))) for _ in range(10)]
print(f"device_get 10 tiny arrays  : {t(lambda: jax.device_get(ys)):8.2f} ms")
