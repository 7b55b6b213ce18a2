"""Residual factor library — the full cost-functor surface of the reference.

The active factors live inline where they are used (lidar/odometry.py,
lidar/mapping.py, vision/vo.py); this module provides the complete set —
including the ones the reference defines but does not wire into the active
path (CostFunctor33 / CostFunctor23, ceres_cost_function.h:10-52, 98-145;
LidarDistanceFactor, lidarFactor.hpp:141-171) — as batched JAX functions
usable as solver.lm ResidualFamily bodies or standalone.

Conventions: (w, t) = angle-axis + translation for camera factors (like the
reference's VO parameter block), (q, t) quaternion + translation for lidar
factors.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import so3


def point_3d3d(w, t, X0, X1):
    """CostFunctor33: R(w) X0 + t - X1 -> [B, 3]."""
    return so3.rotate_axis_angle(jnp.broadcast_to(w, X0.shape), X0) + t - X1


def point_3d2d(w, t, X0, x1_bar):
    """CostFunctor32 (active): [B, 2]."""
    Xp = so3.rotate_axis_angle(jnp.broadcast_to(w, X0.shape), X0) + t
    return Xp[:, :2] - Xp[:, 2:3] * x1_bar


def point_2d3d(w, t, x0_bar, X1):
    """CostFunctor23: inverse-direction 2D-3D residual: [B, 2]."""
    wi = -w
    RtX1 = so3.rotate_axis_angle(jnp.broadcast_to(wi, X1.shape), X1)
    Rtt = so3.rotate_axis_angle(wi, t)
    d = RtX1 - Rtt
    return d[:, :2] - d[:, 2:3] * x0_bar


def epipolar_2d2d(w, t, x0_bar, x1_bar):
    """CostFunctor22 (active): x1b . (t x R x0b) -> [B, 1]."""
    b0 = jnp.concatenate([x0_bar, jnp.ones_like(x0_bar[:, :1])], axis=1)
    b1 = jnp.concatenate([x1_bar, jnp.ones_like(x1_bar[:, :1])], axis=1)
    Rb0 = so3.rotate_axis_angle(jnp.broadcast_to(w, b0.shape), b0)
    tx = jnp.cross(jnp.broadcast_to(t, Rb0.shape), Rb0)
    return jnp.sum(b1 * tx, axis=-1, keepdims=True)


def lidar_edge(q, t, p, a, b, s=None):
    """LidarEdgeFactor: ||(p'-a) x (p'-b)|| / ||a-b|| per axis -> [B, 3]."""
    if s is None:
        lp = so3.quat_rotate(q, p) + t
    else:
        w = so3.axis_angle_from_quat(q)
        lp = so3.quat_rotate(so3.quat_from_axis_angle(s * w), p) + s * t
    nu = jnp.cross(lp - a, lp - b)
    de = jnp.linalg.norm(a - b, axis=-1, keepdims=True)
    return nu / jnp.maximum(de, 1e-9)


def lidar_plane(q, t, p, pj, pl, pm, s=None):
    """LidarPlaneFactor: (p'-pj) . normalize((pj-pl) x (pj-pm)) -> [B, 1]."""
    n = jnp.cross(pj - pl, pj - pm)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    if s is None:
        lp = so3.quat_rotate(q, p) + t
    else:
        w = so3.axis_angle_from_quat(q)
        lp = so3.quat_rotate(so3.quat_from_axis_angle(s * w), p) + s * t
    return jnp.sum((lp - pj) * n, axis=-1, keepdims=True)


def lidar_plane_norm(q, t, p, n_hat, d):
    """LidarPlaneNormFactor: n . (R p + t) + d -> [B, 1]."""
    pw = so3.quat_rotate(q, p) + t
    return (jnp.sum(pw * n_hat, axis=-1) + d)[:, None]


def lidar_distance(q, t, p, target):
    """LidarDistanceFactor: R p + t - target -> [B, 3]."""
    return so3.quat_rotate(q, p) + t - target
