"""LOAM scan registration as a fixed-shape vectorized kernel.

Reimplements reference src/lidar_odometry_mapping/src/scan_registration.cpp
(input():131-449) the TPU way:

- range/NaN filtering, ring assignment and azimuth relative time are pure
  elementwise ops over a padded [N] point buffer (reference :157-267),
- the per-ring concatenated cloud becomes a dense [n_scans, ring_capacity]
  layout built with one stable sort (reference :276-281),
- the 11-point curvature (reference :288-307) is a windowed sum per ring,
- the sequential greedy feature selection with neighbor suppression
  (reference :312-431) becomes a vmapped-over-rings lax loop: 6 sectors x
  (20 corner picks + 4 flat picks), each pick an argmax/argmin over the ring
  lane — rings are independent in the reference (suppression never crosses a
  ring boundary), so the 64 rings run data-parallel on the VPU,
- the per-ring 0.2 m VoxelGrid on the less-flat cloud (reference :433-439)
  uses the hash/sort/segment-mean kernel in voxel.py.

Outputs are ScanFeatures with masked fixed-capacity clouds.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LidarProfile, ScanRegistrationConfig
from .ring_assoc import RingSlab, SENTINEL
from .types import FeatureCloud, ScanFeatures
from .voxel import voxel_downsample_rows_slab

_2PI = 2.0 * math.pi


def _trunc_int(x):
    """C-style int() cast: truncation toward zero."""
    return jnp.trunc(x).astype(jnp.int32)


def assign_rings(xyz: jnp.ndarray, valid: jnp.ndarray, profile: LidarProfile):
    """Elevation-angle ring id (reference scan_registration.cpp:192-226)."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    angle = jnp.degrees(jnp.arctan2(z, jnp.sqrt(x * x + y * y)))
    n = profile.n_scans
    if n == 16:
        sid = _trunc_int((angle + 15.0) / 2.0 + 0.5)
        ok = (sid >= 0) & (sid < n)
    elif n == 32:
        sid = _trunc_int((angle + 92.0 / 3.0) * 3.0 / 4.0)
        ok = (sid >= 0) & (sid < n)
    elif n == 64:
        upper = _trunc_int((2.0 - angle) * 3.0 + 0.5)
        lower = n // 2 + _trunc_int((-8.83 - angle) * 2.0 + 0.5)
        sid = jnp.where(angle >= -8.83, upper, lower)
        ok = (angle <= 2.0) & (angle >= -24.33) & (sid >= 0) & (sid <= 50)
    else:
        raise ValueError(f"unsupported scan_line {n}")
    return sid, valid & ok


def _relative_time(xyz, valid_range, valid_full):
    """Azimuth-interpolated relative time (reference :166-264), vectorized.

    The reference's sequential halfPassed flag becomes an exclusive
    cumulative-or over the trigger condition.
    """
    n = xyz.shape[0]
    ori = -jnp.arctan2(xyz[:, 1], xyz[:, 0])
    idx = jnp.arange(n)
    first = jnp.argmax(valid_range)
    last = n - 1 - jnp.argmax(valid_range[::-1])
    start_ori = ori[first]
    end_ori = ori[last] + _2PI
    span = end_ori - start_ori
    end_ori = jnp.where(span > 3 * math.pi, end_ori - _2PI,
                        jnp.where(span < math.pi, end_ori + _2PI, end_ori))

    before = ori
    before = jnp.where(before < start_ori - math.pi / 2, before + _2PI, before)
    before = jnp.where(before > start_ori + 3 * math.pi / 2, before - _2PI, before)
    trigger = valid_full & (before - start_ori > math.pi)
    half_passed = jnp.concatenate([jnp.zeros((1,), bool),
                                   jnp.cumsum(trigger.astype(jnp.int32))[:-1] > 0])

    after = ori + _2PI
    after = jnp.where(after < end_ori - 3 * math.pi / 2, after + _2PI, after)
    after = jnp.where(after > end_ori + math.pi / 2, after - _2PI, after)

    o = jnp.where(half_passed, after, before)
    return (o - start_ori) / (end_ori - start_ori)


def _ring_layout(xyz, ring, rel_time, valid, n_scans: int, ring_cap: int):
    """Scatter points into a dense [n_scans, ring_cap] layout preserving
    firing order within each ring (reference :266, :276-281)."""
    n = xyz.shape[0]
    key = jnp.where(valid, ring, n_scans) * n + jnp.arange(n)
    order = jnp.argsort(key)  # ring-major, stable in firing order
    ring_s = jnp.where(valid, ring, n_scans)[order]
    counts_raw = jnp.bincount(ring_s, length=n_scans + 1)[:n_scans]
    counts = jnp.minimum(counts_raw, ring_cap)
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts_raw.dtype), jnp.cumsum(counts_raw)[:-1]]
    )
    rank = jnp.arange(n) - starts[jnp.minimum(ring_s, n_scans - 1)]
    dest_r = jnp.where((ring_s < n_scans) & (rank >= 0) & (rank < ring_cap), ring_s, n_scans)
    rank = jnp.clip(rank, 0, ring_cap - 1)

    pts = jnp.zeros((n_scans + 1, ring_cap, 3), xyz.dtype)
    pts = pts.at[dest_r, rank].set(xyz[order], mode="drop")[:n_scans]
    rt = jnp.zeros((n_scans + 1, ring_cap), xyz.dtype)
    rt = rt.at[dest_r, rank].set(rel_time[order], mode="drop")[:n_scans]
    return pts, rt, counts


def _curvature(ring_pts: jnp.ndarray) -> jnp.ndarray:
    """11-point curvature per ring: ||sum_{|l|<=5} p_{i+l} - 11 p_i||^2
    (reference :288-307)."""
    cs = jnp.concatenate(
        [jnp.zeros_like(ring_pts[:, :1]), jnp.cumsum(ring_pts, axis=1)], axis=1
    )  # [S, R+1, 3]
    r = ring_pts.shape[1]
    pad = jnp.pad(cs, ((0, 0), (5, 6), (0, 0)), mode="edge")
    win = pad[:, 11 : 11 + r] - pad[:, :r]  # sum over [i-5, i+5] (clamped)
    diff = win - 11.0 * ring_pts
    return jnp.sum(diff * diff, axis=-1)


def _break_prefix(pts, gap_sq):
    """Bf[i] = number of 3D gap breaks (consecutive-point distance^2 >
    gap_sq) among gaps (0,1)...(i-1,i). Two indices i<j are gap-connected
    iff Bf[i] == Bf[j]; the reference's +-5 suppression window around a pick
    (scan_registration.cpp:353-376) marks exactly the indices within 5 that
    are gap-connected to the pick, so suppression becomes one elementwise
    compare against the pick's prefix value — no dynamic slices."""
    d = jnp.sum((pts[1:] - pts[:-1]) ** 2, axis=-1)  # gap (i, i+1)
    brk = (d > gap_sq).astype(jnp.int32)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(brk)])


def _suppress_mask(idx, bf, ind):
    """Elementwise suppression window of a pick at `ind` (see _break_prefix)."""
    return (jnp.abs(idx - ind) <= 5) & (bf == bf[ind])


def _sector_masks(idx, start, end, ring_ok, exists, n_sectors):
    """[n_sectors, R] membership masks (reference sector bounds :317-320)."""
    masks = []
    for j in range(n_sectors):
        sp = start + (end - start) * j // n_sectors
        ep = start + (end - start) * (j + 1) // n_sectors - 1
        masks.append((idx >= sp) & (idx <= ep) & ring_ok & exists)
    return jnp.stack(masks)


def _select_ring(pts, curv, cnt, cfg: ScanRegistrationConfig):
    """Greedy feature selection for one ring. Returns label [R] int32:
    2 sharp, 1 less-sharp, -1 flat, 0 none; and the selectable-range mask.

    Strict mode (cfg.strict_sector_order) follows the reference exactly:
    sectors processed sequentially, each pick seeing all previous sectors'
    suppression. Batched mode (default) runs the 6 sectors' k-th picks
    simultaneously — one argmax over [n_sectors, R] per pick round instead
    of n_sectors separate rounds (6x fewer serialized device ops). The two
    differ only when a pick's +-5 suppression window crosses a sector
    boundary during the same round — a <=5/~425-candidate edge effect.
    """
    r_cap = pts.shape[0]
    idx = jnp.arange(r_cap)
    start, end = 5, cnt - 6  # scanStartInd/scanEndInd in-ring (reference :278-280)
    ring_ok = (end - start) >= 6  # reference :314
    exists = idx < cnt
    gap_sq = cfg.neighbor_suppress_gap_sq
    thr = cfg.curvature_threshold
    n_corner = cfg.max_less_sharp_per_sector
    n_flat = cfg.max_flat_per_sector
    bf = _break_prefix(pts, gap_sq)
    sect = _sector_masks(idx, start, end, ring_ok, exists, cfg.n_sectors)

    picked = jnp.zeros((r_cap,), bool)
    label = jnp.zeros((r_cap,), jnp.int32)

    if cfg.strict_sector_order:
        # Reference-exact sequential order — sector j's picks see all of
        # sector j-1's suppression — as ONE flat fori_loop of
        # n_sectors * (n_corner + n_flat) steps with a branchless body
        # (step s decodes to sector j, pick rank k; corner picks maximize
        # curv, flat picks maximize -curv). The original nested
        # sectors-x-picks loops took >550 s to compile on the axon backend
        # (round 2); this single-loop form compiles like the batched path
        # (one loop body) and just runs 6x more serialized pick rounds.
        per_sector = n_corner + n_flat

        def strict_pick(s, st):
            picked, label = st
            j = s // per_sector
            k = s % per_sector
            in_sector = jax.lax.dynamic_index_in_dim(sect, j, keepdims=False)
            is_corner = k < n_corner
            score = jnp.where(is_corner, curv, -curv)
            gate = jnp.where(is_corner, curv > thr, curv < thr)
            c = jnp.where(in_sector & ~picked & gate, score, -jnp.inf)
            ind = jnp.argmax(c)
            ok = c[ind] > jnp.where(is_corner, thr, -thr)
            lab = jnp.where(is_corner,
                            jnp.where(k < cfg.max_sharp_per_sector, 2, 1),
                            -1)
            label = jnp.where(ok, label.at[ind].set(lab), label)
            # The reference breaks out before suppressing the last flat
            # pick (scan_registration.cpp:390-394).
            do_supp = ok & (is_corner | (k - n_corner < n_flat - 1))
            picked = picked | (do_supp & _suppress_mask(idx, bf, ind))
            return picked, label

        _, label = jax.lax.fori_loop(0, cfg.n_sectors * per_sector,
                                     strict_pick, (picked, label))
    else:
        ns = cfg.n_sectors
        srange = jnp.arange(ns)

        def corner_round(k, st):
            picked, label = st
            elig = sect & (~picked & (curv > thr))[None, :]  # [ns, R]
            c = jnp.where(elig, curv[None, :], -jnp.inf)
            ind = jnp.argmax(c, axis=1)  # [ns]
            ok = c[srange, ind] > thr
            lab = jnp.where(k < cfg.max_sharp_per_sector, 2, 1)
            label = label.at[ind].set(jnp.where(ok, lab, label[ind]))
            supp = (jnp.abs(idx[None, :] - ind[:, None]) <= 5) & (
                bf[None, :] == bf[ind][:, None]) & ok[:, None]
            picked = picked | jnp.any(supp, axis=0)
            return picked, label

        picked, label = jax.lax.fori_loop(0, n_corner, corner_round,
                                          (picked, label))

        def flat_round(k, st):
            picked, label = st
            elig = sect & (~picked & (curv < thr))[None, :]
            c = jnp.where(elig, curv[None, :], jnp.inf)
            ind = jnp.argmin(c, axis=1)
            ok = c[srange, ind] < thr
            label = label.at[ind].set(jnp.where(ok, -1, label[ind]))
            supp = (jnp.abs(idx[None, :] - ind[:, None]) <= 5) & (
                bf[None, :] == bf[ind][:, None]) & (
                ok & (k < n_flat - 1))[:, None]
            picked = picked | jnp.any(supp, axis=0)
            return picked, label

        _, label = jax.lax.fori_loop(0, n_flat, flat_round, (picked, label))

    selectable = (idx >= start) & (idx <= end - 1) & ring_ok & exists
    return label, selectable


def _select_rings_pallas_kernel(curv_ref, bf_ref, cnt_ref, label_ref,
                                *, cfg: ScanRegistrationConfig):
    """Reference-exact strict sector selection for ALL rings in one program.

    The XLA fori_loop form round-trips the [S, R] picked/label state through
    HBM on every one of the n_sectors*(n_corner+n_flat) = 144 serialized
    pick rounds (~2.0 ms/frame, the largest single cost in the fused LOAM
    step after round-5's association fixes). Here the whole state lives in
    VMEM for the entire loop: same argmax/suppression semantics as
    _select_ring's strict branch (reference scan_registration.cpp:312-440),
    bit-identical labels, ~10x less wall time.
    """
    S, R = curv_ref.shape
    curv = curv_ref[:]
    bf = bf_ref[:]
    cnt = cnt_ref[:]  # [S, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (S, R), 1)
    start = jnp.int32(5)
    end = cnt[:, 0] - 6  # [S]
    ring_ok = (end - start) >= 6
    exists = col < cnt
    thr = cfg.curvature_threshold
    n_corner = cfg.max_less_sharp_per_sector
    n_flat = cfg.max_flat_per_sector
    per_sector = n_corner + n_flat
    ns = cfg.n_sectors
    width = end - start  # [S]

    def round_body(s, st):
        picked, label = st
        j = s // per_sector
        k = s % per_sector
        is_corner = k < n_corner
        sp = start + width * j // ns
        ep = start + width * (j + 1) // ns - 1
        in_sector = ((col >= sp[:, None]) & (col <= ep[:, None])
                     & ring_ok[:, None] & exists)
        # corner: maximize curv gated at curv > thr; flat: maximize -curv
        # gated at curv < thr — both are `score > tj` with score = sgn*curv
        # (avoids bool-vector selects, which Mosaic cannot legalize)
        sgn = jnp.where(is_corner, jnp.float32(1.0), jnp.float32(-1.0))
        tj = jnp.where(is_corner, jnp.float32(thr), jnp.float32(-thr))
        score = curv * sgn
        c = jnp.where(in_sector & (picked == 0) & (score > tj), score,
                      -jnp.inf)
        m = jnp.max(c, axis=1)  # [S]
        ind = jnp.min(jnp.where(c >= m[:, None], col, jnp.int32(2**30)),
                      axis=1)  # [S] first argmax
        ok = m > tj
        lab = jnp.where(is_corner,
                        jnp.where(k < cfg.max_sharp_per_sector, 2, 1), -1)
        at_pick = col == ind[:, None]
        label = jnp.where(at_pick & ok[:, None], lab, label)
        # the reference breaks before suppressing the last flat pick
        do_supp = ok & (is_corner | (k - n_corner < n_flat - 1))
        bf_pick = jnp.max(jnp.where(at_pick, bf, jnp.int32(-1)), axis=1)
        supp = ((jnp.abs(col - ind[:, None]) <= 5)
                & (bf == bf_pick[:, None]) & do_supp[:, None])
        picked = jnp.where(supp, 1, picked)
        return picked, label

    picked0 = jnp.zeros((S, R), jnp.int32)
    label0 = jnp.zeros((S, R), jnp.int32)
    _, label = jax.lax.fori_loop(0, ns * per_sector, round_body,
                                 (picked0, label0))
    label_ref[:] = label


def _select_rings_pallas(pts, curv, counts, cfg: ScanRegistrationConfig):
    """VMEM-resident strict selection over all rings; returns (label [S, R],
    selectable [S, R]) identical to vmapped _select_ring(strict)."""
    S, R = curv.shape
    bf = jax.vmap(lambda p: _break_prefix(p, cfg.neighbor_suppress_gap_sq))(
        pts)  # [S, R+1] -> use first R entries (prefix value AT each index)
    bf = bf[:, :R]
    label = pl.pallas_call(
        partial(_select_rings_pallas_kernel, cfg=cfg),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, R), jnp.int32),
    )(curv, bf.astype(jnp.int32), counts.astype(jnp.int32)[:, None])
    idx = jnp.arange(R)[None, :]
    start, end = 5, counts[:, None] - 6
    ring_ok = (end - 5) >= 6
    exists = idx < counts[:, None]
    selectable = (idx >= start) & (idx <= end - 1) & ring_ok & exists
    return label, selectable


def _features_from_layout(pts, rt, counts, cfg: ScanRegistrationConfig
                          ) -> ScanFeatures:
    """Shared back half: curvature, greedy selection, and feature-cloud
    assembly from a dense per-ring layout pts [S, R, 3] / rt [S, R] /
    counts [S] (reference scan_registration.cpp:288-449)."""
    S, R = pts.shape[0], pts.shape[1]
    curv = _curvature(pts)

    # Strict (reference-exact) selection runs as the VMEM-resident Pallas
    # kernel on TPU (the XLA fori_loop form pays an HBM round trip of the
    # [S, R] state per pick round — ~2.0 ms/frame vs ~0.2); the vmapped XLA
    # form remains for CPU (tests / virtual meshes) and for batched mode.
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if cfg.strict_sector_order and on_tpu:
        label, selectable = _select_rings_pallas(pts, curv, counts, cfg)
    else:
        label, selectable = jax.vmap(
            lambda p, c, k: _select_ring(p, c, k, cfg))(pts, curv, counts)

    ring_ids = jnp.broadcast_to(jnp.arange(S)[:, None], (S, R))
    exists = jnp.arange(R)[None, :] < counts[:, None]

    # Per-ring label partition: one row-wise multi-operand sort by group key
    # (0=sharp, 1=less-sharp, 2=flat, 3=rest) replaces the previous S*R-point
    # global argsort (rings are independent; row-wise sorting is several
    # times cheaper on the chip). Each cloud is then a fixed per-ring block
    # — sharp is a prefix of less-sharp, flat the following group — flattened
    # with masks; capacity splits evenly across rings (cap // S per ring),
    # which also degrades overflow gracefully (the old global truncation
    # dropped entire trailing rings).
    group = jnp.where(label == 2, 0,
                      jnp.where(label == 1, 1,
                                jnp.where(label == -1, 2, 3)))  # [S, R]
    g_s, x_s, y_s, z_s, rt_s = jax.lax.sort(
        (group, pts[..., 0], pts[..., 1], pts[..., 2], rt),
        num_keys=1, dimension=1)
    pts_s = jnp.stack([x_s, y_s, z_s], axis=-1)  # [S, R, 3]
    n_sharp_r = jnp.sum(group == 0, axis=1)  # [S]
    n_less_r = jnp.sum(group == 1, axis=1)
    n_flat_r = jnp.sum(group == 2, axis=1)

    def slice_rows(start_r, count_r, cap):
        per = cap // S
        cols = jnp.clip(start_r[:, None] + jnp.arange(per)[None, :], 0, R - 1)
        m = (jnp.arange(per)[None, :] < jnp.minimum(count_r, per)[:, None])
        xyz_b = jnp.take_along_axis(pts_s, cols[:, :, None], axis=1)
        rt_b = jnp.take_along_axis(rt_s, cols, axis=1)
        return FeatureCloud(
            xyz=jnp.where(m[:, :, None], xyz_b, 0.0).reshape(cap, 3),
            ring=jnp.where(m, ring_ids[:, :per], 0).reshape(cap),
            rel_time=jnp.where(m, rt_b, 0.0).reshape(cap),
            mask=m.reshape(cap),
        )

    zero_r = jnp.zeros((S,), jnp.int32)
    sharp = slice_rows(zero_r, n_sharp_r, cfg.sharp_cap)
    less_sharp = slice_rows(zero_r, n_sharp_r + n_less_r, cfg.less_sharp_cap)
    flat = slice_rows(n_sharp_r + n_less_r, n_flat_r, cfg.flat_cap)

    # LO candidate slabs in the native per-ring layout (ring_assoc.py):
    # sentinel-padded so the association kernel needs no masks. less_sharp
    # is already a per-ring block (slice_rows); less_flat keeps the slab
    # layout straight out of the per-ring voxel filter — the old global
    # prefix-compaction sorts existed only to restore the dense layout
    # lax.approx_min_k's recall depended on, and the exact per-ring-min
    # association removed that dependency.
    ls_per = cfg.less_sharp_cap // S
    ls_xyz = less_sharp.xyz.reshape(S, ls_per, 3)
    ls_m = less_sharp.mask.reshape(S, ls_per)
    less_sharp_slab = RingSlab(jnp.where(ls_m[:, :, None], ls_xyz, SENTINEL))

    lf_mask = selectable & (label <= 0)
    lf_cap_r = cfg.less_flat_cap // S
    lf_xyz, lf_extra, lf_m = voxel_downsample_rows_slab(
        pts, lf_mask, cfg.less_flat_leaf, lf_cap_r, extra=rt[..., None],
    )
    less_flat_slab = RingSlab(jnp.where(lf_m[:, :, None], lf_xyz, SENTINEL))
    less_flat = FeatureCloud(
        xyz=jnp.where(lf_m[:, :, None], lf_xyz, 0.0).reshape(-1, 3),
        ring=jnp.where(lf_m, jnp.arange(S, dtype=jnp.int32)[:, None],
                       0).reshape(-1),
        rel_time=jnp.where(lf_m, lf_extra[..., 0], 0.0).reshape(-1),
        mask=lf_m.reshape(-1),
    )

    full = FeatureCloud(xyz=pts.reshape(-1, 3), ring=ring_ids.reshape(-1),
                        rel_time=rt.reshape(-1), mask=exists.reshape(-1))

    return ScanFeatures(sharp=sharp, less_sharp=less_sharp,
                        flat=flat, less_flat=less_flat, full=full,
                        less_sharp_slab=less_sharp_slab,
                        less_flat_slab=less_flat_slab)


@partial(jax.jit, static_argnames=("profile", "cfg"))
def register_scan(
    xyz: jnp.ndarray,
    n_points: jnp.ndarray,
    profile: LidarProfile,
    cfg: ScanRegistrationConfig,
) -> ScanFeatures:
    """Extract LOAM features from one padded scan [max_points, 3]."""
    n = xyz.shape[0]
    in_range = jnp.arange(n) < n_points
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    xyz = jnp.where(finite[:, None], xyz, 0.0)
    rng_sq = jnp.sum(xyz * xyz, axis=-1)
    valid_range = in_range & finite & (rng_sq >= profile.minimum_range**2)

    ring, valid = assign_rings(xyz, valid_range, profile)
    rel = _relative_time(xyz, valid_range, valid)

    S, R = profile.n_scans, profile.ring_capacity
    pts, rt, counts = _ring_layout(xyz, ring, rel, valid, S, R)
    return _features_from_layout(pts, rt, counts, cfg)


@partial(jax.jit, static_argnames=("profile", "cfg", "scale"))
def register_scan_polar(
    ranges_u16: jnp.ndarray,  # [S, A] quantized ranges (0 = no return)
    elev_rad: jnp.ndarray,  # [S]
    profile: LidarProfile,
    cfg: ScanRegistrationConfig,
    scale: float = 0.005,
) -> ScanFeatures:
    """Extract LOAM features straight from a quantized range image.

    The range image IS the per-ring layout (row = ring, column order =
    firing order, rel_time = column/A), so the xyz path's elevation-angle
    ring assignment, halfPassed azimuth unwrap, and the 131k-point global
    sort (7.6 ms/frame of the 9.4 ms register_scan) all collapse into one
    per-row compaction of valid returns."""
    S, A = ranges_u16.shape
    r = ranges_u16.astype(jnp.float32) * scale
    valid = r >= profile.minimum_range  # also rejects r == 0 (no return)
    az = -jnp.linspace(0.0, 2.0 * jnp.pi, A, endpoint=False)
    ce, se = jnp.cos(elev_rad), jnp.sin(elev_rad)
    ca, sa = jnp.cos(az), jnp.sin(az)
    xyz = jnp.stack([
        ce[:, None] * ca[None, :],
        ce[:, None] * sa[None, :],
        jnp.broadcast_to(se[:, None], (S, A)),
    ], axis=-1) * r[:, :, None]  # [S, A, 3]
    rel = jnp.broadcast_to((jnp.arange(A) / A)[None, :], (S, A))

    # compact valid returns to the front of each ring: one stable row-wise
    # multi-operand sort (payload carried through the sort network — no
    # post-sort gathers)
    col = jnp.broadcast_to(jnp.arange(A, dtype=jnp.int32)[None, :], (S, A))
    key = jnp.where(valid, col, A)
    _, x_s, y_s, z_s, rel_s, v_s = jax.lax.sort(
        (key, xyz[..., 0], xyz[..., 1], xyz[..., 2], rel,
         valid.astype(jnp.int32)),
        num_keys=1, dimension=1)
    ok = v_s > 0
    pts = jnp.where(ok[:, :, None], jnp.stack([x_s, y_s, z_s], axis=-1), 0.0)
    rt = jnp.where(ok, rel_s, 0.0)
    counts = jnp.sum(valid, axis=1).astype(jnp.int32)
    return _features_from_layout(pts, rt, counts, cfg)
