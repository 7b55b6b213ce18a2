"""Gather layout experiments: is the 8-cell probe gather bound by row
descriptors (rows x planes) or bytes? Buckets derive from perturbed queries
each iteration so nothing hoists. Run ALONE on the chip."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.lidar.gridmap import _hash_cell
from vloam_tpu.runtime.profiling import fence

ITERS = 32


def chained(label, fn, *args, iters=ITERS):
    def body(carry, _):
        perturbed, done = [], False
        for a in args:
            if (not done and hasattr(a, "dtype")
                    and jnp.issubdtype(a.dtype, jnp.floating)):
                perturbed.append(a + carry)
                done = True
            else:
                perturbed.append(a)
        out = fn(*perturbed)
        leaf = [x for x in jax.tree_util.tree_leaves(out)
                if jnp.issubdtype(x.dtype, jnp.floating)][0]
        return (leaf.reshape(-1)[0] * 0.0).astype(jnp.float32), None

    @jax.jit
    def run():
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    fence(run())
    t0 = time.perf_counter()
    out = run()
    fence(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:56s} {ms:9.3f} ms/iter", flush=True)
    return ms


def buckets_of(q, cell, nb):
    s = q / cell
    c = jnp.floor(s).astype(jnp.int32)
    off = jnp.where(s - c < 0.5, -1, 1).astype(jnp.int32)
    hs = []
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                hs.append(_hash_cell(c[:, 0] + sx * off[:, 0],
                                     c[:, 1] + sy * off[:, 1],
                                     c[:, 2] + sz * off[:, 2], nb))
    return jnp.stack(hs, axis=1)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    for tag, nb, cap, Q in (("corner", 1 << 17, 32, 2048),
                            ("surf", 1 << 17, 16, 8192)):
        cell = 2.0
        queries = jnp.asarray(rng.normal(0, 40, (Q, 3)).astype(np.float32))

        t_planar = jnp.asarray(
            rng.normal(0, 40, (3, nb, cap)).astype(np.float32))

        def g_planar(q):
            b = buckets_of(q, cell, nb)
            return t_planar[:, b].sum()

        chained(f"{tag}: planar [3,{nb},{cap}] (3 gathers)", g_planar, queries)

        t_il = jnp.asarray(
            rng.normal(0, 40, (nb, 3 * cap)).astype(np.float32))

        def g_il(q):
            b = buckets_of(q, cell, nb)
            return t_il[b].sum()

        chained(f"{tag}: interleaved [{nb},{3*cap}] (1 gather)", g_il, queries)

        def full_il(q):
            b = buckets_of(q, cell, nb)
            rows = t_il[b]  # [Q, 8, 3cap]
            x = rows[:, :, 0 * cap:1 * cap].reshape(Q, 8 * cap)
            y = rows[:, :, 1 * cap:2 * cap].reshape(Q, 8 * cap)
            z = rows[:, :, 2 * cap:3 * cap].reshape(Q, 8 * cap)
            d = ((x - q[:, 0:1]) ** 2 + (y - q[:, 1:2]) ** 2
                 + (z - q[:, 2:3]) ** 2)
            nd, ni = jax.lax.top_k(-d, 5)
            nx = jnp.take_along_axis(x, ni, axis=1)
            ny = jnp.take_along_axis(y, ni, axis=1)
            nz = jnp.take_along_axis(z, ni, axis=1)
            return -nd, jnp.stack([nx, ny, nz], axis=-1)

        chained(f"{tag}: interleaved FULL knn", full_il, queries)

        t_i16 = jnp.asarray(
            (rng.normal(0, 40, (nb, 3 * cap)) * 100).astype(np.int16))

        def g_i16(q):
            b = buckets_of(q, cell, nb)
            return (t_i16[b].astype(jnp.float32) * 0.01).sum()

        chained(f"{tag}: interleaved int16 (1 gather)", g_i16, queries)

        # row-count scaling: same bytes, half the rows
        t_half = jnp.asarray(
            rng.normal(0, 40, (nb // 2, 6 * cap)).astype(np.float32))

        def g_half(q):
            b = buckets_of(q, cell, nb // 2)[:, :4]  # 4 rows/query
            return t_half[b].sum()

        chained(f"{tag}: half rows [{nb//2},{6*cap}] (4/query)", g_half,
                queries)


if __name__ == "__main__":
    main()
