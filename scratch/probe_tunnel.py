"""Tunnel health probe: RTT, upload/download bandwidth, tiny-program
launch latency. Run before/alongside any wall-clock comparison — the
tunnel's characteristics drift by the hour and confound A/Bs."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def probe(n=10):
    out = {}
    x = jnp.zeros((8,), jnp.float32) + 1.0
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        jax.device_get(x + 1.0)
    out["rtt_small_ms"] = (time.perf_counter() - t0) / n * 1e3

    big = np.zeros((2 * 1024 * 1024,), np.float32)  # 8 MB
    jnp.asarray(big).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        jnp.asarray(big).block_until_ready()
    up = (time.perf_counter() - t0) / 3
    out["upload_MBps"] = 8.0 / up

    bd = jnp.asarray(big) * 1.0
    bd.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_get(bd)
    dn = (time.perf_counter() - t0) / 3
    out["download_MBps"] = 8.0 / dn

    f = jax.jit(lambda a: a * 2.0)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        f(x)
    x2 = f(x)
    x2.block_until_ready()
    out["launch_us_async"] = (time.perf_counter() - t0) / 51 * 1e6
    return out


if __name__ == "__main__":
    for k, v in probe().items():
        print(f"{k}: {v:.2f}")
