"""Microprofile grid_knn internals: hash, gather, distance, select."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.lidar.gridmap import (FeatureGrid, _hash_cell, grid_create,
                                     grid_insert, grid_knn)
from profile_chained import chained

NB, CAP, Q, K = 1 << 17, 16, 16384, 5


def main():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-60, 60, (300000, 3)).astype(np.float32)
    g = grid_create(NB, CAP)
    g = grid_insert(g, jnp.asarray(pts), jnp.ones(len(pts), bool), 2.4, 0.8)
    q = jnp.asarray(rng.uniform(-50, 50, (Q, 3)).astype(np.float32))

    chained("grid_knn full (16k q)", lambda qq: grid_knn(g, qq, 2.4, k=K)[0], q)

    def hash_only(qq):
        s = qq / 2.4
        c = jnp.floor(s).astype(jnp.int32)
        off = jnp.where(s - c < 0.5, -1, 1).astype(jnp.int32)
        hs = []
        for sx in (0, 1):
            for sy in (0, 1):
                for sz in (0, 1):
                    hs.append(_hash_cell(c[:, 0] + sx * off[:, 0],
                                         c[:, 1] + sy * off[:, 1],
                                         c[:, 2] + sz * off[:, 2], NB))
        return jnp.stack(hs, axis=1)

    chained("  hash only", lambda qq: hash_only(qq).astype(jnp.float32), q)

    buckets = hash_only(q)

    def gather_only(bf):
        b = bf.astype(jnp.int32)
        return g.pts[b].sum(axis=(1, 2, 3))

    chained("  gather only", gather_only, buckets.astype(jnp.float32))

    def gather_dist(qq):
        b = hash_only(qq)
        cand = g.pts[b].reshape(Q, 8 * CAP, 3)
        return jnp.min(jnp.sum((cand - qq[:, None, :]) ** 2, axis=-1), axis=1)

    chained("  hash+gather+dist+min", gather_dist, q)

    def full_topk(qq):
        b = hash_only(qq)
        cand = g.pts[b].reshape(Q, 8 * CAP, 3)
        d = jnp.sum((cand - qq[:, None, :]) ** 2, axis=-1)
        nd, ni = jax.lax.top_k(-d, K)
        return -nd

    chained("  hash+gather+dist+topk", full_topk, q)

    def full_argmin5(qq):
        b = hash_only(qq)
        cand = g.pts[b].reshape(Q, 8 * CAP, 3)
        d = jnp.sum((cand - qq[:, None, :]) ** 2, axis=-1)
        outs = []
        for _ in range(K):
            i = jnp.argmin(d, axis=1)
            dm = jnp.take_along_axis(d, i[:, None], axis=1)
            outs.append(dm)
            d = jnp.where(jnp.arange(8 * CAP)[None, :] == i[:, None],
                          jnp.inf, d)
        return jnp.concatenate(outs, axis=1)

    chained("  hash+gather+dist+5xargmin", full_argmin5, q)

    def full_approx(qq):
        b = hash_only(qq)
        cand = g.pts[b].reshape(Q, 8 * CAP, 3)
        d = jnp.sum((cand - qq[:, None, :]) ** 2, axis=-1)
        nd, ni = jax.lax.approx_min_k(d, K)
        return nd

    chained("  hash+gather+dist+approx_min_k", full_approx, q)


if __name__ == "__main__":
    main()
