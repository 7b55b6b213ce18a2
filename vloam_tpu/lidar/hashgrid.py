"""Hashed voxel grid for fixed-radius k-NN (the TPU voxel-hash design from
SURVEY §7: bucket-grid association instead of KD-trees).

Used by the mapping stage where the candidate set is large (up to ~300k
padded map points) and the acceptance radius is small (1 m): a murmur-hashed
1 m cell table is built once per frame (one sort), and each query probes its
3x3x3 neighbor cells — a few hundred candidates instead of the full set,
~100x less distance work than the tiled brute force at these sizes.

Hash collisions only ADD candidates (two far cells sharing a bucket), never
remove them, so results equal brute force within the probe radius; points
beyond a bucket's capacity are dropped (capacity is sized ~4x the expected
cell occupancy at the map's voxel-filter resolution).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _hash_cell(ix, iy, iz, n_buckets):
    u = jnp.uint32
    h = (ix.astype(u) * u(73856093)) + (iy.astype(u) * u(19349669)) + (
        iz.astype(u) * u(83492791))
    h = h ^ (h >> u(16))
    h = h * u(0x85EBCA6B)
    h = h ^ (h >> u(13))
    return (h & u(n_buckets - 1)).astype(jnp.int32)


class HashGrid(NamedTuple):
    table: jnp.ndarray  # [n_buckets, cap] int32 indices into points
    counts: jnp.ndarray  # [n_buckets] int32
    points: jnp.ndarray  # [N, 3]
    mask: jnp.ndarray  # [N]
    cell: float


@partial(jax.jit, static_argnames=("cell", "n_buckets", "cap"))
def build_hash_grid(points, mask, cell: float, n_buckets: int = 1 << 17,
                    cap: int = 16) -> HashGrid:
    n = points.shape[0]
    c = jnp.floor(points / cell).astype(jnp.int32)
    h = _hash_cell(c[:, 0], c[:, 1], c[:, 2], n_buckets)
    key = jnp.where(mask, h, n_buckets)
    order = jnp.argsort(key)
    key_s = key[order]
    counts = jnp.bincount(key_s, length=n_buckets + 1)[:n_buckets]
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts).astype(jnp.int32)[:-1],
    ])
    rank = jnp.arange(n, dtype=jnp.int32) - starts[jnp.minimum(key_s, n_buckets - 1)]
    dest_b = jnp.where((key_s < n_buckets) & (rank >= 0) & (rank < cap),
                       key_s, n_buckets)
    rank = jnp.clip(rank, 0, cap - 1)
    table = jnp.zeros((n_buckets + 1, cap), jnp.int32)
    table = table.at[dest_b, rank].set(order.astype(jnp.int32),
                                       mode="drop")[:n_buckets]
    return HashGrid(table=table, counts=jnp.minimum(counts, cap),
                    points=points, mask=mask, cell=cell)


_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]


@partial(jax.jit, static_argnames=("k",))
def hash_grid_knn(grid: HashGrid, queries: jnp.ndarray, k: int = 5):
    """k-NN among points within the 3x3x3 cell probe (all true neighbors
    closer than `cell` are guaranteed found). Returns (d_sq [Q,k],
    idx [Q,k]) ascending, inf where fewer than k candidates."""
    n_buckets, cap = grid.table.shape
    c = jnp.floor(queries / grid.cell).astype(jnp.int32)
    hs = []
    for dx, dy, dz in _OFFSETS:
        hs.append(_hash_cell(c[:, 0] + dx, c[:, 1] + dy, c[:, 2] + dz,
                             n_buckets))
    buckets = jnp.stack(hs, axis=1)  # [Q, 27]
    idx = grid.table[buckets]  # [Q, 27, cap]
    slot_ok = (jnp.arange(cap)[None, None, :]
               < grid.counts[buckets][:, :, None])  # [Q, 27, cap]
    idx = idx.reshape(queries.shape[0], -1)  # [Q, 27*cap]
    ok = slot_ok.reshape(queries.shape[0], -1)
    cand = grid.points[idx]  # [Q, 27*cap, 3]
    ok = ok & grid.mask[idx]
    d = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
    d = jnp.where(ok, d, jnp.inf)
    nd, ni = jax.lax.top_k(-d, k)
    return -nd, jnp.take_along_axis(idx, ni, axis=1)
