"""Microbench: fetch strategies over the axon tunnel.

Questions:
1. What does a blocking jax.device_get of an N-float vector cost when the
   device is idle (wire latency vs bandwidth)?
2. Does arr.copy_to_host_async() at dispatch time make the later
   device_get cheap (overlapped transfer)?
3. What does one track-frame-sized dispatch cost end to end?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


@jax.jit
def burn(x, iters=200):
    def body(i, x):
        return x @ x * 0.999 + 0.001
    return jax.lax.fori_loop(0, iters, body, x)


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # 1. blocking fetch latency vs size
    for n in (1024, 65536, 1 << 20, 1 << 23):
        x = jnp.ones((n,), jnp.float32)
        x.block_until_ready()
        dt = timeit(lambda: jax.device_get(x), n=10)
        print(f"blocking device_get {n*4/1e6:8.2f} MB: {dt*1000:7.2f} ms")

    # 2. async copy then fetch
    for n in (65536, 1 << 20, 1 << 23):
        x = jnp.ones((n,), jnp.float32)
        x.block_until_ready()

        def async_fetch():
            y = x + 0.0  # fresh array each time
            y.copy_to_host_async()
            # simulate host work / other dispatches in between
            time.sleep(0.03)
            return np.asarray(y)

        def sync_fetch():
            y = x + 0.0
            y.block_until_ready()
            time.sleep(0.03)
            return np.asarray(y)

        da = timeit(async_fetch, n=10) - 0.03
        ds = timeit(sync_fetch, n=10) - 0.03
        print(f"fetch after 30ms gap {n*4/1e6:8.2f} MB: "
              f"async={da*1000:7.2f} ms sync={ds*1000:7.2f} ms")

    # 3. dispatch overhead: K chained cheap dispatches then one sync
    x = jnp.ones((256, 256), jnp.float32)
    burn(x).block_until_ready()

    def chain(k):
        y = x
        for _ in range(k):
            y = burn(y)
        return jax.device_get(y[0, :4])

    t1 = timeit(lambda: chain(1), n=10)
    t8 = timeit(lambda: chain(8), n=10)
    print(f"burn chain: 1={t1*1000:.2f} ms 8={t8*1000:.2f} ms "
          f"-> per-dispatch {(t8-t1)/7*1000:.2f} ms")

    # 4. does device_get of MANY small arrays differ from one flat?
    xs = [jnp.ones((1000,), jnp.float32) for _ in range(50)]
    for a in xs:
        a.block_until_ready()
    d_many = timeit(lambda: jax.device_get(xs), n=5)
    flat = jnp.concatenate(xs)
    flat.block_until_ready()
    d_one = timeit(lambda: jax.device_get(flat), n=5)
    print(f"50 small fetches: {d_many*1000:.2f} ms; one flat: {d_one*1000:.2f} ms")


if __name__ == "__main__":
    main()
