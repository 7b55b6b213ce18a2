"""Voxel-grid downsampling with static shapes (TPU replacement for
pcl::VoxelGrid, reference scan_registration.cpp:433-439 and
laser_mapping.cpp:432-440, 688-702).

Strategy: quantize -> hash -> sort by hash -> segment mean -> compact.
Everything is O(N log N) XLA sort + segment ops; no data-dependent shapes.
Voxels are identified by a 32-bit hash of the integer cell coords (plus an
optional partition id, e.g. the scan ring); hash collisions merge far-apart
points into one centroid, which is statistically negligible at these sizes
(~1e-3 expected collisions per 100k points) and harmless downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_P1, _P2, _P3, _P4 = 73856093, 19349669, 83492791, 2654435761


def _hash_cells(ix, iy, iz, part):
    """Murmur3-finalized spatial hash: the plain xor-of-products hash has
    ~40% collisions on small coordinate ranges; the avalanche finalizer
    brings it to the ~N^2/2^32 birthday bound."""
    u = jnp.uint32
    h = (
        (ix.astype(u) * u(_P1))
        + (iy.astype(u) * u(_P2))
        + (iz.astype(u) * u(_P3))
        + (part.astype(u) * u(_P4))
    )
    h = h ^ (h >> u(16))
    h = h * u(0x85EBCA6B)
    h = h ^ (h >> u(13))
    h = h * u(0xC2B2AE35)
    h = h ^ (h >> u(16))
    return h


def _segment_tail(hs, xs, es, ps, ms, out_cap, n_extra, dtype,
                  sorted_ids: bool):
    """Shared post-sort reduction: segment-mean runs of equal hash keys.
    Inputs are hash-sorted flat arrays (equal keys adjacent). sorted_ids
    must be False when invalid runs are interleaved between valid ones (the
    row-wise sort leaves each row's invalid tail in place, so the flattened
    seg ids are NOT monotone — segment ops must not assume sortedness)."""
    is_start = jnp.concatenate([jnp.ones((1,), bool), hs[1:] != hs[:-1]]) & ms
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # -1 until first valid
    seg_id = jnp.where(ms, seg_id, out_cap)  # drop invalid
    n_seg = jnp.max(jnp.where(ms, seg_id + 1, 0))

    ones = ms.astype(dtype)
    # one fused sorted-scatter for counts+coords(+extras): [N, 4+E]
    payload = jnp.concatenate(
        [ones[:, None], xs * ones[:, None]]
        + ([es * ones[:, None]] if es is not None else []), axis=1)
    sums = jax.ops.segment_sum(payload, seg_id, num_segments=out_cap + 1,
                               indices_are_sorted=sorted_ids)[:out_cap]
    counts = sums[:, 0]
    denom = jnp.maximum(counts, 1.0)[:, None]
    out_xyz = sums[:, 1:4] / denom
    out_extra = sums[:, 4:4 + n_extra] / denom if n_extra else None

    # partition id of the voxel = min over members (constant within a voxel
    # when partition participates in the hash, modulo collisions).
    big = jnp.int32(2**30)
    out_part = jax.ops.segment_min(
        jnp.where(ms, ps, big), seg_id, num_segments=out_cap + 1,
        indices_are_sorted=sorted_ids,
    )[:out_cap]
    out_part = jnp.where(counts > 0, out_part, 0).astype(jnp.int32)

    out_mask = jnp.arange(out_cap) < jnp.minimum(n_seg, out_cap)
    return out_xyz, out_extra, out_part, out_mask


def voxel_downsample(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    leaf: float,
    out_cap: int,
    partition: jnp.ndarray | None = None,
    extra: jnp.ndarray | None = None,
):
    """Centroid-downsample masked points into `out_cap` voxel centroids.

    partition: optional int32 [N]; points in different partitions never merge
      (used to reproduce the reference's per-ring VoxelGrid invocation).
    extra: optional [N, E] float features averaged alongside xyz.

    Returns (out_xyz [out_cap,3], out_extra [out_cap,E] or None,
             out_part [out_cap], out_mask [out_cap]).
    """
    n = xyz.shape[0]
    part = jnp.zeros((n,), jnp.int32) if partition is None else partition
    cell = jnp.floor(xyz / leaf).astype(jnp.int32)
    h = _hash_cells(cell[:, 0], cell[:, 1], cell[:, 2], part)
    # Invalid points hash to the max key so they sort to the tail.
    h = jnp.where(mask, h, jnp.uint32(0xFFFFFFFF))

    # Multi-operand lax.sort carries the payload through the sort network —
    # no post-sort gathers (TPU gathers cost ~6 ns per row descriptor; the
    # sort itself is ~10x cheaper than 4 payload gathers at these sizes).
    n_extra = 0 if extra is None else extra.shape[1]
    operands = (h, xyz[:, 0], xyz[:, 1], xyz[:, 2],
                *(extra[:, j] for j in range(n_extra)),
                part, mask.astype(jnp.int32))
    sorted_ops = jax.lax.sort(operands, num_keys=1)
    hs = sorted_ops[0]
    xs = jnp.stack(sorted_ops[1:4], axis=1)
    es = (jnp.stack(sorted_ops[4:4 + n_extra], axis=1) if n_extra else None)
    ps = sorted_ops[4 + n_extra]
    ms = sorted_ops[5 + n_extra] > 0
    return _segment_tail(hs, xs, es, ps, ms, out_cap, n_extra, xyz.dtype,
                         sorted_ids=True)


def voxel_downsample_rows_slab(
    pts: jnp.ndarray,  # [S, R, 3] per-ring layout
    mask: jnp.ndarray,  # [S, R]
    leaf: float,
    ring_cap: int,
    extra: jnp.ndarray | None = None,  # [S, R, E]
):
    """Per-ring voxel downsample that KEEPS the per-ring slab layout:
    returns (xyz [S, ring_cap, 3], extra [S, ring_cap, E] | None,
    mask [S, ring_cap]) where row s holds ring s's voxel centroids as a
    dense prefix. This is the natural input layout for the per-ring
    association kernel (ring_assoc.py); rings with more than ring_cap
    voxels drop the tail (the flat variant's global cap truncates the same
    way, just globally)."""
    S, R = pts.shape[0], pts.shape[1]
    part = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, R))
    cell = jnp.floor(pts / leaf).astype(jnp.int32)
    h = _hash_cells(cell[..., 0], cell[..., 1], cell[..., 2], part)
    h = jnp.where(mask, h, jnp.uint32(0xFFFFFFFF))

    n_extra = 0 if extra is None else extra.shape[2]
    operands = (h, pts[..., 0], pts[..., 1], pts[..., 2],
                *(extra[..., j] for j in range(n_extra)),
                mask.astype(jnp.int32))
    sorted_ops = jax.lax.sort(operands, num_keys=1, dimension=1)
    hs = sorted_ops[0]
    ms = sorted_ops[4 + n_extra] > 0
    # row-local segment ids: seg[s, j] = index of point j's voxel within
    # ring s; invalid points route to the trash row (segment S*ring_cap).
    is_start = jnp.concatenate(
        [jnp.ones((S, 1), bool), hs[:, 1:] != hs[:, :-1]], axis=1) & ms
    seg = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    n_seg = jnp.max(jnp.where(ms, seg, -1), axis=1) + 1  # [S]
    gseg = jnp.where(ms & (seg < ring_cap),
                     part * ring_cap + seg, S * ring_cap)

    ones = ms.astype(pts.dtype)
    payload = jnp.concatenate(
        [ones[..., None], jnp.stack(sorted_ops[1:4], axis=-1) * ones[..., None]]
        + ([jnp.stack(sorted_ops[4:4 + n_extra], axis=-1) * ones[..., None]]
           if n_extra else []), axis=-1).reshape(S * R, -1)
    # NOT sorted: each row's invalid tail (gseg = S*ring_cap) interleaves
    # between rows in the flattened stream.
    sums = jax.ops.segment_sum(payload, gseg.reshape(-1),
                               num_segments=S * ring_cap + 1,
                               indices_are_sorted=False)[:S * ring_cap]
    counts = sums[:, 0]
    denom = jnp.maximum(counts, 1.0)[:, None]
    out_xyz = (sums[:, 1:4] / denom).reshape(S, ring_cap, 3)
    out_extra = ((sums[:, 4:4 + n_extra] / denom).reshape(S, ring_cap, n_extra)
                 if n_extra else None)
    out_mask = (jnp.arange(ring_cap)[None, :]
                < jnp.minimum(n_seg, ring_cap)[:, None])
    return out_xyz, out_extra, out_mask


def voxel_downsample_rows(
    pts: jnp.ndarray,  # [S, R, 3] per-ring layout
    mask: jnp.ndarray,  # [S, R]
    leaf: float,
    out_cap: int,
    extra: jnp.ndarray | None = None,  # [S, R, E]
):
    """voxel_downsample specialized for the dense per-ring layout, with the
    row index as the partition (the reference's per-ring VoxelGrid,
    scan_registration.cpp:433-439).

    The global N-point sort becomes a row-wise [S, R] sort (hashes embed the
    ring id, so equal-hash runs never cross rows and the flattened row-major
    stream feeds the same segment reduction) — on the target chip row-wise
    sorting S independent rings is several times cheaper than one S*R sort."""
    S, R = pts.shape[0], pts.shape[1]
    part = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, R))
    cell = jnp.floor(pts / leaf).astype(jnp.int32)
    h = _hash_cells(cell[..., 0], cell[..., 1], cell[..., 2], part)
    h = jnp.where(mask, h, jnp.uint32(0xFFFFFFFF))

    n_extra = 0 if extra is None else extra.shape[2]
    operands = (h, pts[..., 0], pts[..., 1], pts[..., 2],
                *(extra[..., j] for j in range(n_extra)),
                part, mask.astype(jnp.int32))
    sorted_ops = jax.lax.sort(operands, num_keys=1, dimension=1)
    hs = sorted_ops[0].reshape(-1)
    xs = jnp.stack([o.reshape(-1) for o in sorted_ops[1:4]], axis=1)
    es = (jnp.stack([o.reshape(-1) for o in sorted_ops[4:4 + n_extra]], axis=1)
          if n_extra else None)
    ps = sorted_ops[4 + n_extra].reshape(-1)
    ms = sorted_ops[5 + n_extra].reshape(-1) > 0
    return _segment_tail(hs, xs, es, ps, ms, out_cap, n_extra, pts.dtype,
                         sorted_ids=False)
