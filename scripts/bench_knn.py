"""Microbenchmark: scan-to-map 5-NN association at pipeline shapes.

The mapping stage's masked_knn (surf: 16384 queries x 307200 candidates,
corner: 4096 x 76800, k=5) dominates the fused frame step. This script
times the current XLA tiled brute force at several matmul precisions and
(when present) the Pallas fused kernel, to direct optimization.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.lidar.knn import masked_knn


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("surf  16384x307200", 16384, 307200),
        ("corner 4096x76800", 4096, 76800),
        ("lo_flat 2048x32768", 2048, 32768),
        ("lo_sharp 1024x8192", 1024, 8192),
    ]
    for name, Q, C in shapes:
        q = jnp.asarray(rng.uniform(-80, 80, (Q, 3)), jnp.float32)
        c = jnp.asarray(rng.uniform(-80, 80, (C, 3)), jnp.float32)
        m = jnp.asarray(rng.uniform(size=C) < 0.7)
        ms = timeit(lambda a, b, mm: masked_knn(a, b, mm, k=5), q, c, m)
        print(f"{name}: xla masked_knn k=5  {ms:8.3f} ms")
        try:
            from vloam_tpu.lidar.knn_pallas import masked_knn_pallas

            dp, ip = masked_knn_pallas(q, c, m, k=5)
            d0, i0 = masked_knn(q, c, m, k=5)
            derr = float(jnp.max(jnp.abs(dp - d0)))
            agree = float(jnp.mean((ip == i0).astype(jnp.float32)))
            ms2 = timeit(
                lambda a, b, mm: masked_knn_pallas(a, b, mm, k=5), q, c, m)
            print(f"{name}: pallas fused k=5     {ms2:8.3f} ms  "
                  f"(max|dd|={derr:.2e}, idx agree={agree:.4f})")
        except ImportError:
            pass


if __name__ == "__main__":
    main()
