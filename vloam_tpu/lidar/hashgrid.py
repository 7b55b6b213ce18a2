"""Hashed cell-slab grid for fixed-radius k-NN (the TPU voxel-hash design
from SURVEY §7: bucket-grid association instead of KD-trees, replacing
pcl::KdTreeFLANN 5-NN at reference laser_mapping.cpp:477,543).

Layout is chosen for TPU gather economics (measured on-chip: gathers cost
~6 ns per DESCRIPTOR regardless of row width, so one [cap,3] slab gather is
~cap times cheaper than cap row gathers):

- build: one sort of the ~300k map points by hashed 1 m cell id, then a
  single scatter of their COORDINATES into dense slabs [n_buckets, cap, 3].
- query: each of Q queries gathers its 27 neighbor-cell slabs (27 slab
  descriptors/query instead of 27*cap row descriptors), computes squared
  distances to the <= 27*cap candidates on the VPU, and top-k's.
- empty slab entries hold a far-away sentinel coordinate, so no per-slot
  count/mask gathers are needed: sentinel distances (~1e12) lose every
  comparison and fail the 1 m acceptance gate naturally.

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

# far-away but finite: squared distances stay ~1e12 (no inf-inf NaN traps)
SENTINEL = 1.0e6


def _hash_cell(ix, iy, iz, n_buckets):
    u = jnp.uint32
    h = (ix.astype(u) * u(73856093)) + (iy.astype(u) * u(19349669)) + (
        iz.astype(u) * u(83492791))
    h = h ^ (h >> u(16))
    h = h * u(0x85EBCA6B)
    h = h ^ (h >> u(13))
    return (h & u(n_buckets - 1)).astype(jnp.int32)


class CellGrid(NamedTuple):
    slab: jnp.ndarray  # [n_buckets, cap, 3] point coords (SENTINEL padded)
    cell: float


@partial(jax.jit, static_argnames=("cell", "n_buckets", "cap"))
def build_cell_grid(points, mask, cell: float, n_buckets: int = 1 << 17,
                    cap: int = 16) -> CellGrid:
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
    rank = jnp.arange(n, dtype=jnp.int32) - starts[
        jnp.minimum(key_s, n_buckets - 1)]
    dest_b = jnp.where((key_s < n_buckets) & (rank >= 0) & (rank < cap),
                       key_s, n_buckets)
    rank = jnp.clip(rank, 0, cap - 1)
    slab = jnp.full((n_buckets + 1, cap, 3), SENTINEL, jnp.float32)
    slab = slab.at[dest_b, rank].set(points[order], mode="drop")[:n_buckets]
    return CellGrid(slab=slab, cell=cell)


_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]


@partial(jax.jit, static_argnames=("k",))
def cell_grid_knn(grid: CellGrid, queries: jnp.ndarray, k: int = 5):
    """k-NN among points within the 3x3x3 cell probe (all true neighbors
    closer than `cell` are guaranteed found). Returns (d_sq [Q,k] ascending,
    near [Q,k,3] candidate coordinates); slots beyond the candidate count
    return sentinel points with d_sq ~1e12."""
    n_buckets = grid.slab.shape[0]
    cap = grid.slab.shape[1]
    q = queries.shape[0]
    c = jnp.floor(queries / grid.cell).astype(jnp.int32)
    hs = [
        _hash_cell(c[:, 0] + dx, c[:, 1] + dy, c[:, 2] + dz, n_buckets)
        for dx, dy, dz in _OFFSETS
    ]
    buckets = jnp.stack(hs, axis=1)  # [Q, 27]
    cand = grid.slab[buckets].reshape(q, 27 * cap, 3)
    d = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
    nd, ni = jax.lax.top_k(-d, k)
    near = jnp.take_along_axis(cand, ni[:, :, None], axis=1)
    return -nd, near
