"""solve_lo sub-stage profile: pass-1 knn, constrained pass, LM."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr
from vloam_tpu.lidar import odometry as od
from vloam_tpu.lidar.knn import masked_knn, nearest_and_ring_constrained
from vloam_tpu.lidar.odometry import solve_lo

from profile_chained import chained


def main():
    cfg = kitti_hdl64()
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(2, speed=1.1, yaw_rate=0.01)
    feats = []
    for k, T in enumerate(poses):
        pts = synthetic.simulate_scan(scene, T, n_scans=cfg.lidar.n_scans,
                                      n_azimuth=1800, noise=0.01, seed=k)
        padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
        feats.append(jax.jit(lambda s, nn: sr.register_scan(
            s, nn, cfg.lidar, cfg.scanreg))(jnp.asarray(padded), jnp.int32(n)))
    f0, f1 = feats

    q0 = jnp.asarray([0, 0, 0, 1.0], jnp.float32)
    t0v = jnp.zeros(3, jnp.float32)

    chained("solve_lo (2 rounds x 4 LM)", lambda a: solve_lo(
        f1.sharp._replace(xyz=a), f1.flat, f0.less_sharp, f0.less_flat,
        q0, t0v, cfg.lo)[1], f1.sharp.xyz)

    chained("  corner pass1 knn (1024x8192)", lambda q: masked_knn(
        q, f0.less_sharp.xyz, f0.less_sharp.mask, k=1)[0], f1.sharp.xyz)
    chained("  surf pass1 knn (2048x32768)", lambda q: masked_knn(
        q, f0.less_flat.xyz, f0.less_flat.mask, k=1)[0], f1.flat.xyz)

    chained("  corner constrained full", lambda q: nearest_and_ring_constrained(
        q, f0.less_sharp.xyz, f0.less_sharp.ring, f0.less_sharp.mask,
        cfg.lo.nearby_scan, mode="corner")["d2"], f1.sharp.xyz)
    chained("  surf constrained full", lambda q: nearest_and_ring_constrained(
        q, f0.less_flat.xyz, f0.less_flat.ring, f0.less_flat.mask,
        cfg.lo.nearby_scan, mode="surf")["d3"], f1.flat.xyz)

    x = jnp.concatenate([q0, t0v])
    chained("  associate_corners", lambda a: od.associate_corners(
        f1.sharp._replace(xyz=a), f0.less_sharp, x, cfg.lo)[2], f1.sharp.xyz)
    chained("  associate_surfs", lambda a: od.associate_surfs(
        f1.flat._replace(xyz=a), f0.less_flat, x, cfg.lo)[0], f1.flat.xyz)

    # LM only: fix associations, run the solver
    a, b, de, v_c = od.associate_corners(f1.sharp, f0.less_sharp, x, cfg.lo)
    pj, n_hat, v_s = od.associate_surfs(f1.flat, f0.less_flat, x, cfg.lo)
    from vloam_tpu.solver.lm import ResidualFamily, lm_solve
    from vloam_tpu.geometry import so3

    def lm_only(xx):
        def make_families(xv):
            qq, tt = xv[:4], xv[4:]

            def edge_fn(delta):
                qd = so3.quat_multiply(qq, so3.quat_from_axis_angle(delta[:3]))
                td = tt + delta[3:]
                lp = so3.quat_rotate(qd, f1.sharp.xyz) + td
                nu = jnp.cross(lp - a, lp - b)
                return nu / jnp.maximum(de, 1e-9)[:, None]

            def plane_fn(delta):
                qd = so3.quat_multiply(qq, so3.quat_from_axis_angle(delta[:3]))
                td = tt + delta[3:]
                lp = so3.quat_rotate(qd, f1.flat.xyz) + td
                return jnp.sum((lp - pj) * n_hat, axis=-1, keepdims=True)

            return [ResidualFamily(edge_fn, v_c.astype(jnp.float32)),
                    ResidualFamily(plane_fn, v_s.astype(jnp.float32))]

        return lm_solve(make_families, od._retract, xx, dim=6,
                        iterations=4, huber_delta=0.1)

    chained("  lm_solve (4 iters)", lm_only, x)


if __name__ == "__main__":
    main()
