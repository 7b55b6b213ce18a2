"""Scan-to-map refinement (A-LOAM laserMapping) — TPU-native.

Reimplements reference src/lidar_odometry_mapping/src/laser_mapping.cpp:

- the 21x21x11 array of 50 m cubes with shift-recentering (:207-402) becomes
  a **circular-buffer tensor map**: fixed [n_cubes, capacity, 3] point slabs
  addressed by (world_cube mod dims); each slot remembers which world cube it
  holds and is lazily cleared when a new cube claims it — recentering is O(1)
  and jit-friendly instead of six nested shift loops,
- the 5x5x3 neighbor gather (:404-428) is a static window gather,
- pcl VoxelGrid on the frame stacks (:432-440) and on touched cubes
  (:688-702) uses voxel.voxel_downsample (vmapped per cube),
- KdTreeFLANN 5-NN (:477,:543) is the tiled MXU brute force in knn.py,
- the line test covariance eigendecomposition (:493-516) uses the
  closed-form 3x3 eigensolver, the plane fit QR solve (:545-573) a 3x3
  normal-equation solve,
- Ceres LM (:609-617) is the shared batched IRLS-LM.

State transform chain (reference :140-144, :185-195):
  q_w_curr = q_wmap_wodom * q_wodom_curr (prediction), refined by the solve;
  transformUpdate: q_wmap_wodom = q_w_curr * q_wodom_curr^-1.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LaserMappingConfig
from ..geometry import so3
from ..solver.eig3 import eigvals_sym3, principal_eigenvector
from ..solver.lm import ResidualFamily, lm_solve
from .knn import masked_knn
from .types import FeatureCloud
from .voxel import voxel_downsample

_EPS = 1e-9
_INVALID_COORD = jnp.int32(-(2**30))


class CubeMap(NamedTuple):
    """Circular-buffer voxel-cube map."""

    corner_pts: jnp.ndarray  # [NC, cap_c, 3]
    corner_cnt: jnp.ndarray  # [NC]
    surf_pts: jnp.ndarray  # [NC, cap_s, 3]
    surf_cnt: jnp.ndarray  # [NC]
    slot_coord: jnp.ndarray  # [NC, 3] world cube coordinate held by each slot

    @staticmethod
    def create(cfg: LaserMappingConfig) -> "CubeMap":
        nc = cfg.cube_width * cfg.cube_height * cfg.cube_depth
        return CubeMap(
            corner_pts=jnp.zeros((nc, cfg.cube_corner_capacity, 3), jnp.float32),
            corner_cnt=jnp.zeros((nc,), jnp.int32),
            surf_pts=jnp.zeros((nc, cfg.cube_surf_capacity, 3), jnp.float32),
            surf_cnt=jnp.zeros((nc,), jnp.int32),
            slot_coord=jnp.full((nc, 3), _INVALID_COORD),
        )


def _cube_coord(p: jnp.ndarray, cube_size: float) -> jnp.ndarray:
    """World point -> integer cube coordinate (reference :207-216,:643-652:
    int((x+25)/50) with negative correction == floor)."""
    return jnp.floor((p + cube_size / 2.0) / cube_size).astype(jnp.int32)


def _slot_of(coord: jnp.ndarray, cfg: LaserMappingConfig) -> jnp.ndarray:
    W, H, D = cfg.cube_width, cfg.cube_height, cfg.cube_depth
    i = jnp.mod(coord[..., 0], W)
    j = jnp.mod(coord[..., 1], H)
    k = jnp.mod(coord[..., 2], D)
    return i + W * j + W * H * k


def _window_offsets(cfg: LaserMappingConfig) -> np.ndarray:
    """The 5x5x3 neighbor window (reference :404-420)."""
    rw, rh, rd = cfg.gather_w // 2, cfg.gather_h // 2, cfg.gather_d // 2
    offs = [
        (di, dj, dk)
        for dk in range(-rd, rd + 1)
        for dj in range(-rh, rh + 1)
        for di in range(-rw, rw + 1)
    ]
    return np.asarray(offs, np.int32)


@partial(jax.jit, static_argnames=("cfg",))
def gather_window(cube_map: CubeMap, center_coord: jnp.ndarray, cfg: LaserMappingConfig):
    """Collect the neighbor cubes' points around the center cube.
    Returns (slots [75], coords [75,3], corner window [75,cap,3] + mask,
    surf window + mask)."""
    offs = jnp.asarray(_window_offsets(cfg))
    coords = center_coord[None, :] + offs  # [75, 3]
    slots = _slot_of(coords, cfg)
    valid_cube = jnp.all(cube_map.slot_coord[slots] == coords, axis=-1)
    c_pts = cube_map.corner_pts[slots]
    c_cnt = jnp.where(valid_cube, cube_map.corner_cnt[slots], 0)
    s_pts = cube_map.surf_pts[slots]
    s_cnt = jnp.where(valid_cube, cube_map.surf_cnt[slots], 0)
    c_mask = jnp.arange(c_pts.shape[1])[None, :] < c_cnt[:, None]
    s_mask = jnp.arange(s_pts.shape[1])[None, :] < s_cnt[:, None]
    return slots, coords, c_pts, c_mask, s_pts, s_mask


def _map_knn(p_w, map_pts, map_mask, grid, cfg):
    """5-NN in the gathered map -> (d_sq [B,k], near [B,k,3]): cell-slab
    grid probe when enabled (exact within the 1 m acceptance radius; the
    default — measured ~20x cheaper on TPU), tiled brute force otherwise."""
    if grid is not None:
        from .hashgrid import cell_grid_knn

        return cell_grid_knn(grid, p_w, k=cfg.knn)
    d, idx = masked_knn(p_w, map_pts, map_mask, k=cfg.knn)
    return d, map_pts[idx]


def _corner_terms(stack_xyz, stack_mask, map_pts, map_mask, x, cfg, grid=None):
    """Line features from 5-NN covariance (reference :472-517)."""
    q, t = x[:4], x[4:]
    p_w = so3.quat_rotate(q, stack_xyz) + t
    d, near = _map_knn(p_w, map_pts, map_mask, grid, cfg)
    ok = stack_mask & (d[:, cfg.knn - 1] < cfg.neighbor_radius_sq)
    center = jnp.mean(near, axis=1)
    dm = near - center[:, None, :]
    cov = jnp.einsum("bki,bkj->bij", dm, dm) / cfg.knn
    lams = eigvals_sym3(cov)
    is_line = lams[:, 2] > cfg.eigen_ratio * lams[:, 1]
    u = principal_eigenvector(cov, lams[:, 2])
    a = center + cfg.edge_half_length * u
    b = center - cfg.edge_half_length * u
    valid = ok & is_line
    de = jnp.linalg.norm(a - b, axis=-1)
    return a, b, de, valid


def _surf_terms(stack_xyz, stack_mask, map_pts, map_mask, x, cfg, grid=None):
    """Plane features from 5-NN LS fit A n = -1 (reference :538-581)."""
    q, t = x[:4], x[4:]
    p_w = so3.quat_rotate(q, stack_xyz) + t
    d, near = _map_knn(p_w, map_pts, map_mask, grid, cfg)
    ok = stack_mask & (d[:, cfg.knn - 1] < cfg.neighbor_radius_sq)
    AtA = jnp.einsum("bki,bkj->bij", near, near)
    Atb = -jnp.sum(near, axis=1)  # A^T * (-1)
    # closed-form 3x3 solve via adjugate
    det = jnp.linalg.det(AtA)
    adj = jnp.stack(
        [
            jnp.cross(AtA[:, 1], AtA[:, 2]),
            jnp.cross(AtA[:, 2], AtA[:, 0]),
            jnp.cross(AtA[:, 0], AtA[:, 1]),
        ],
        axis=-1,
    )  # columns are cofactor rows -> adj^T arrangement s.t. inv = adj / det
    n = jnp.einsum("bij,bj->bi", adj, Atb) / jnp.where(
        jnp.abs(det) > 1e-12, det, jnp.inf
    )[:, None]
    norm = jnp.linalg.norm(n, axis=-1)
    nood = 1.0 / jnp.maximum(norm, _EPS)  # negative_OA_dot_norm (:558)
    n_hat = n / jnp.maximum(norm, _EPS)[:, None]
    # plane validity: all 5 residuals within tolerance (:563-573)
    resid = jnp.abs(jnp.einsum("bki,bi->bk", near, n_hat) + nood[:, None])
    plane_ok = jnp.all(resid <= cfg.plane_fit_tolerance, axis=-1)
    valid = ok & plane_ok & (jnp.abs(det) > 1e-12) & (norm > _EPS)
    return n_hat, nood, valid


def _retract(x, delta):
    q = so3.quat_normalize(so3.quat_multiply(x[:4], so3.quat_from_axis_angle(delta[:3])))
    return jnp.concatenate([q, x[4:] + delta[3:]])


@partial(jax.jit, static_argnames=("cfg",))
def solve_mapping(
    cube_map: CubeMap,
    corner_stack_xyz: jnp.ndarray,
    corner_stack_mask: jnp.ndarray,
    surf_stack_xyz: jnp.ndarray,
    surf_stack_mask: jnp.ndarray,
    q_pred: jnp.ndarray,
    t_pred: jnp.ndarray,
    cfg: LaserMappingConfig,
):
    """One mapping solve + map update. Returns (new_map, q_w, t_w, stats)."""
    center = _cube_coord(t_pred, cfg.cube_size)
    slots, coords, c_pts, c_mask, s_pts, s_mask = gather_window(cube_map, center, cfg)
    nw = slots.shape[0]
    cap_c, cap_s = c_pts.shape[1], s_pts.shape[1]
    flat_c = c_pts.reshape(-1, 3)
    flat_cm = c_mask.reshape(-1)
    flat_s = s_pts.reshape(-1, 3)
    flat_sm = s_mask.reshape(-1)
    n_map_corner = jnp.sum(flat_cm.astype(jnp.int32))
    n_map_surf = jnp.sum(flat_sm.astype(jnp.int32))

    x0 = jnp.concatenate([q_pred, t_pred]).astype(jnp.float32)

    enough = (n_map_corner > cfg.min_corner_map_points) & (
        n_map_surf > cfg.min_surf_map_points
    )

    if cfg.use_hash_grid:
        from .hashgrid import build_cell_grid

        grid_c = build_cell_grid(flat_c, flat_cm, cfg.grid_cell,
                                 cap=cfg.grid_corner_cap)
        grid_s = build_cell_grid(flat_s, flat_sm, cfg.grid_cell,
                                 cap=cfg.grid_surf_cap)
    else:
        grid_c = grid_s = None

    def do_solve(x):
        for _ in range(cfg.outer_rounds):
            a, b, de, v_c = _corner_terms(
                corner_stack_xyz, corner_stack_mask, flat_c, flat_cm, x, cfg,
                grid_c,
            )
            n_hat, nood, v_s = _surf_terms(
                surf_stack_xyz, surf_stack_mask, flat_s, flat_sm, x, cfg,
                grid_s,
            )

            def make_families(xx):
                def edge_fn(delta):
                    qd = so3.quat_multiply(xx[:4], so3.quat_from_axis_angle(delta[:3]))
                    td = xx[4:] + delta[3:]
                    pw = so3.quat_rotate(qd, corner_stack_xyz) + td
                    nu = jnp.cross(pw - a, pw - b)
                    return nu / jnp.maximum(de, _EPS)[:, None]

                def plane_fn(delta):
                    qd = so3.quat_multiply(xx[:4], so3.quat_from_axis_angle(delta[:3]))
                    td = xx[4:] + delta[3:]
                    pw = so3.quat_rotate(qd, surf_stack_xyz) + td
                    return (jnp.sum(pw * n_hat, axis=-1) + nood)[:, None]

                return [
                    ResidualFamily(edge_fn, v_c.astype(jnp.float32)),
                    ResidualFamily(plane_fn, v_s.astype(jnp.float32)),
                ]

            x = lm_solve(make_families, _retract, x, dim=6,
                         iterations=cfg.gn_iterations, huber_delta=cfg.huber_delta)
        return x

    x = jax.lax.cond(enough, do_solve, lambda x: x, x0)
    q_w, t_w = x[:4], x[4:]

    new_map = _insert_and_filter(
        cube_map, slots, coords, c_pts, c_mask, s_pts, s_mask,
        corner_stack_xyz, corner_stack_mask, surf_stack_xyz, surf_stack_mask,
        q_w, t_w, center, cfg,
    )
    stats = {"n_map_corner": n_map_corner, "n_map_surf": n_map_surf,
             "solved": enough}
    return new_map, q_w, t_w, stats


def _append_to_window(win_pts, win_mask, new_pts, new_valid, local_idx, nw, cap):
    """Append new points to per-window-cube slabs (vectorized multi-append).
    local_idx: [B] target window cube of each new point (nw = out of range)."""
    cnt = jnp.sum(win_mask.astype(jnp.int32), axis=1)  # [nw]
    B = new_pts.shape[0]
    li = jnp.where(new_valid, local_idx, nw)
    # rank of each point within its target cube: stable sort by cube id
    order = jnp.argsort(li * B + jnp.arange(B))
    li_s = li[order]
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(jnp.bincount(li_s, length=nw + 1)[:-1].astype(jnp.int32)),
    ])
    rank = jnp.arange(B) - starts[jnp.minimum(li_s, nw)]
    pos = cnt[jnp.minimum(li_s, nw - 1)] + rank
    dest_cube = jnp.where((li_s < nw) & (pos < cap), li_s, nw)
    pos = jnp.clip(pos, 0, cap - 1)
    pts_pad = jnp.concatenate([win_pts, jnp.zeros((1, cap, 3), win_pts.dtype)])
    mask_pad = jnp.concatenate([win_mask, jnp.zeros((1, cap), bool)])
    pts_pad = pts_pad.at[dest_cube, pos].set(new_pts[order], mode="drop")
    mask_pad = mask_pad.at[dest_cube, pos].set(True, mode="drop")
    return pts_pad[:nw], mask_pad[:nw]


def _insert_and_filter(
    cube_map: CubeMap, slots, coords, c_pts, c_mask, s_pts, s_mask,
    corner_stack_xyz, corner_stack_mask, surf_stack_xyz, surf_stack_mask,
    q_w, t_w, center, cfg: LaserMappingConfig,
):
    """Scatter refined frame points into the window cubes, voxel-filter each
    touched cube (reference :638-702), then write the window back into the
    circular-buffer map (claiming stale slots)."""
    nw = slots.shape[0]
    offs = jnp.asarray(_window_offsets(cfg))
    lo = center + offs[0]  # window origin cube coord
    W, H = cfg.gather_w, cfg.gather_h

    def local_index(pw):
        c = _cube_coord(pw, cfg.cube_size) - lo
        inside = (
            (c[:, 0] >= 0) & (c[:, 0] < cfg.gather_w)
            & (c[:, 1] >= 0) & (c[:, 1] < cfg.gather_h)
            & (c[:, 2] >= 0) & (c[:, 2] < cfg.gather_d)
        )
        li = c[:, 0] + W * c[:, 1] + W * H * c[:, 2]
        return jnp.where(inside, li, nw), inside

    pw_c = so3.quat_rotate(q_w, corner_stack_xyz) + t_w
    li_c, in_c = local_index(pw_c)
    c_pts2, c_mask2 = _append_to_window(
        c_pts, c_mask, pw_c, corner_stack_mask & in_c, li_c, nw,
        cfg.cube_corner_capacity,
    )
    pw_s = so3.quat_rotate(q_w, surf_stack_xyz) + t_w
    li_s, in_s = local_index(pw_s)
    s_pts2, s_mask2 = _append_to_window(
        s_pts, s_mask, pw_s, surf_stack_mask & in_s, li_s, nw,
        cfg.cube_surf_capacity,
    )

    # voxel-filter each touched cube (reference :688-702)
    def filt(pts, mask, leaf, cap):
        out_xyz, _, _, out_mask = voxel_downsample(pts, mask, leaf, cap)
        return jnp.where(out_mask[:, None], out_xyz, 0.0), out_mask

    c_pts3, c_mask3 = jax.vmap(lambda p, m: filt(p, m, cfg.line_resolution,
                                                 cfg.cube_corner_capacity))(c_pts2, c_mask2)
    s_pts3, s_mask3 = jax.vmap(lambda p, m: filt(p, m, cfg.plane_resolution,
                                                 cfg.cube_surf_capacity))(s_pts2, s_mask2)

    # write back: window slots now hold `coords` cubes
    new_corner_pts = cube_map.corner_pts.at[slots].set(c_pts3)
    new_corner_cnt = cube_map.corner_cnt.at[slots].set(
        jnp.sum(c_mask3.astype(jnp.int32), axis=1)
    )
    new_surf_pts = cube_map.surf_pts.at[slots].set(s_pts3)
    new_surf_cnt = cube_map.surf_cnt.at[slots].set(
        jnp.sum(s_mask3.astype(jnp.int32), axis=1)
    )
    new_slot_coord = cube_map.slot_coord.at[slots].set(coords)
    return CubeMap(new_corner_pts, new_corner_cnt, new_surf_pts, new_surf_cnt,
                   new_slot_coord)


def export_map_points(cube_map: CubeMap, max_points: int = 1 << 20):
    """Download the accumulated map as (corner [Mc,3], surf [Ms,3]) numpy
    arrays (the /laser_cloud_map publisher analogue, reference
    laser_mapping.cpp:778-793). One flattened masked download."""
    c_mask = (jnp.arange(cube_map.corner_pts.shape[1])[None, :]
              < cube_map.corner_cnt[:, None])
    s_mask = (jnp.arange(cube_map.surf_pts.shape[1])[None, :]
              < cube_map.surf_cnt[:, None])
    flat = jnp.concatenate([
        cube_map.corner_pts.reshape(-1, 3),
        cube_map.surf_pts.reshape(-1, 3),
    ]).reshape(-1)
    masks = jnp.concatenate([c_mask.reshape(-1), s_mask.reshape(-1)])
    nc = cube_map.corner_pts.shape[0] * cube_map.corner_pts.shape[1]
    pts = np.asarray(flat).reshape(-1, 3)
    m = np.asarray(masks)
    corner = pts[:nc][m[:nc]][:max_points]
    surf = pts[nc:][m[nc:]][:max_points]
    return corner, surf


class LaserMapping:
    """Host-side wrapper mirroring reference LaserMapping (input/solve/
    publish), with f64 odom->map offset bookkeeping."""

    def __init__(self, cfg: LaserMappingConfig):
        from scipy.spatial.transform import Rotation as R

        self.cfg = cfg
        self.R = R
        self.map = CubeMap.create(cfg)
        self.q_wmap_wodom = np.array([0.0, 0.0, 0.0, 1.0])
        self.t_wmap_wodom = np.zeros(3)
        self.q_w = np.array([0.0, 0.0, 0.0, 1.0])
        self.t_w = np.zeros(3)
        self.frame_count = 0
        self.last_stats = {}

    def step(self, corner_cloud: FeatureCloud, surf_cloud: FeatureCloud,
             q_wodom, t_wodom, skip_frame: bool = False):
        """corner_cloud/surf_cloud: current frame's less-sharp / less-flat
        features in sensor frame (reference input(), :167-196)."""
        R = self.R
        q_pred = (R.from_quat(self.q_wmap_wodom) * R.from_quat(q_wodom)).as_quat()
        t_pred = self.t_wmap_wodom + R.from_quat(self.q_wmap_wodom).apply(t_wodom)
        if skip_frame:
            # high-frequency propagation only (reference :186-190, :742-756)
            return {"q_w": q_pred, "t_w": t_pred, "skip": True}

        # voxel-downsample the stacks (reference :432-440)
        c_xyz, _, _, c_m = voxel_downsample(
            corner_cloud.xyz, corner_cloud.mask, self.cfg.line_resolution,
            self.cfg.corner_stack_cap,
        )
        s_xyz, _, _, s_m = voxel_downsample(
            surf_cloud.xyz, surf_cloud.mask, self.cfg.plane_resolution,
            self.cfg.surf_stack_cap,
        )
        new_map, q_w, t_w, stats = solve_mapping(
            self.map, c_xyz, c_m, s_xyz, s_m,
            jnp.asarray(q_pred, jnp.float32), jnp.asarray(t_pred, jnp.float32),
            self.cfg,
        )
        self.map = new_map
        self.q_w = np.asarray(q_w, np.float64)
        self.q_w /= np.linalg.norm(self.q_w)
        self.t_w = np.asarray(t_w, np.float64)
        # transformUpdate (reference :140-144)
        r_w = R.from_quat(self.q_w)
        r_odom = R.from_quat(q_wodom)
        r_off = r_w * r_odom.inv()
        self.q_wmap_wodom = r_off.as_quat()
        self.t_wmap_wodom = self.t_w - r_off.apply(t_wodom)
        self.frame_count += 1
        self.last_stats = {k: (int(v) if hasattr(v, "item") else v)
                           for k, v in stats.items()}
        return {"q_w": self.q_w, "t_w": self.t_w, "skip": False,
                **self.last_stats}
