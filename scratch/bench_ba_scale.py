"""TPU timing of map-scale BA: 96 KFs, 50k landmark rows (VERDICT r3 #6)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from tests.test_ba_scale import make_big_problem
from plsvo_tpu.parallel import ba

rng = np.random.default_rng(0)
for K, L in ((16, 6144), (96, 50176), (128, 100352)):
    prob, _ = make_big_problem(rng, K=K, L=L)
    out, stats = ba.bundle_adjust(prob, n_iter=3)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out, stats = ba.bundle_adjust(prob, n_iter=3)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"K={K} L={L}: 3-iter BA {dt*1e3:.0f} ms "
          f"({dt/3*1e3:.0f} ms/iter), chi2={float(stats.chi2):.4f}",
          flush=True)
