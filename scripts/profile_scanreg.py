"""register_scan sub-stage profile."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr

from profile_chained import chained


def main():
    cfg = kitti_hdl64()
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(2, speed=1.1, yaw_rate=0.01)
    pts = synthetic.simulate_scan(scene, poses[1], n_scans=64,
                                  n_azimuth=1800, noise=0.01, seed=1)
    padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
    scan = jnp.asarray(padded)
    n = jnp.int32(n)
    prof, scfg = cfg.lidar, cfg.scanreg

    chained("register_scan (full)", lambda s: sr.register_scan(
        s, n, prof, scfg).sharp.xyz, scan)

    def upto_layout(s):
        nn = s.shape[0]
        in_range = jnp.arange(nn) < n
        finite = jnp.all(jnp.isfinite(s), axis=-1)
        s = jnp.where(finite[:, None], s, 0.0)
        rng_sq = jnp.sum(s * s, axis=-1)
        valid_range = in_range & finite & (rng_sq >= prof.minimum_range**2)
        ring, valid = sr.assign_rings(s, valid_range, prof)
        rel = sr._relative_time(s, valid_range, valid)
        return sr._ring_layout(s, ring, rel, valid, prof.n_scans,
                               prof.ring_capacity)

    chained("  filter+rings+reltime+layout", lambda s: upto_layout(s)[0], scan)

    pts_l, rt_l, counts = jax.jit(upto_layout)(scan)
    chained("  curvature", sr._curvature, pts_l)
    curv = jax.jit(sr._curvature)(pts_l)

    def select(c):
        return jax.vmap(lambda p, cc, k: sr._select_ring(p, cc, k, scfg))(
            pts_l, c, counts)[0].astype(jnp.float32)

    chained("  select (strict)", select, curv)

    import dataclasses
    scfg_b = dataclasses.replace(scfg, strict_sector_order=False)

    def select_b(c):
        return jax.vmap(lambda p, cc, k: sr._select_ring(p, cc, k, scfg_b))(
            pts_l, c, counts)[0].astype(jnp.float32)

    chained("  select (batched)", select_b, curv)

    from vloam_tpu.lidar.voxel import voxel_downsample
    flat_xyz = pts_l.reshape(-1, 3)
    lf_mask = jnp.arange(flat_xyz.shape[0]) % 3 != 0  # stand-in mask
    chained("  less-flat voxel 163k->32k", lambda x: voxel_downsample(
        x, lf_mask, scfg.less_flat_leaf, scfg.less_flat_cap)[0], flat_xyz)


if __name__ == "__main__":
    main()
