"""Grid-map sub-stage profile: knn / terms / insert / evict, plus the whole
solve_mapping. Run ALONE on the chip."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr
from vloam_tpu.lidar import mapping as mp
from vloam_tpu.lidar.gridmap import grid_evict, grid_insert, grid_knn
from vloam_tpu.lidar.mapping import GridMap, solve_mapping
from vloam_tpu.lidar.voxel import voxel_downsample
from vloam_tpu.runtime.profiling import fence

from profile_chained import chained, chained_carry


def main():
    cfg = kitti_hdl64()
    mcfg = cfg.mapping
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(3, speed=1.1, yaw_rate=0.01)
    scans = []
    for k, T in enumerate(poses):
        pts = synthetic.simulate_scan(scene, T, n_scans=cfg.lidar.n_scans,
                                      n_azimuth=1800, noise=0.01, seed=k)
        padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
        scans.append((jnp.asarray(padded), jnp.int32(n)))

    regj = jax.jit(lambda s, n: sr.register_scan(s, n, cfg.lidar, cfg.scanreg))
    feats1 = regj(*scans[1])

    q0 = jnp.asarray([0, 0, 0, 1.0], jnp.float32)
    t0v = jnp.zeros(3, jnp.float32)
    vdc = jax.jit(lambda x, m: voxel_downsample(
        x, m, mcfg.line_resolution, mcfg.corner_stack_cap))
    vds = jax.jit(lambda x, m: voxel_downsample(
        x, m, mcfg.plane_resolution, mcfg.surf_stack_cap))
    c_xyz, _, _, c_m = vdc(feats1.less_sharp.xyz, feats1.less_sharp.mask)
    s_xyz, _, _, s_m = vds(feats1.less_flat.xyz, feats1.less_flat.mask)

    gm = GridMap.create(mcfg)

    def map_step(g):
        new_g, q_w, t_w, _ = solve_mapping(
            g, c_xyz, c_m, s_xyz, s_m, q0, t0v, mcfg)
        return new_g

    chained_carry("solve_mapping (map carried)", map_step, gm)
    gm2 = map_step(map_step(gm))

    chained("  grid knn corner (4096 q)", lambda q: grid_knn(
        gm2.corner, q, mcfg.corner_cell, k=mcfg.knn)[0], c_xyz)
    chained("  grid knn surf (16384 q)", lambda q: grid_knn(
        gm2.surf, q, mcfg.surf_cell, k=mcfg.knn)[0], s_xyz)

    x0 = jnp.concatenate([q0, t0v])
    gat = jax.jit(lambda q: mp.grid_gather(gm2.corner, q, mcfg.corner_cell))
    cand_c = gat(c_xyz)
    gat_s = jax.jit(lambda q: mp.grid_gather(gm2.surf, q, mcfg.surf_cell))
    cand_s = gat_s(s_xyz)
    chained("  gather corner probe", lambda q: mp.grid_gather(
        gm2.corner, q, mcfg.corner_cell), c_xyz)
    chained("  gather surf probe", lambda q: mp.grid_gather(
        gm2.surf, q, mcfg.surf_cell), s_xyz)
    chained("  corner terms (knn+eig)", lambda cx: mp._corner_terms(
        cx, c_m, cand_c, x0, mcfg)[0], c_xyz)
    chained("  surf terms (knn+planefit)", lambda sx: mp._surf_terms(
        sx, s_m, cand_s, x0, mcfg)[0], s_xyz)

    def ins_c(g):
        return grid_insert(g, c_xyz, c_m, mcfg.corner_cell,
                           mcfg.line_resolution)

    def ins_s(g):
        return grid_insert(g, s_xyz, s_m, mcfg.surf_cell,
                           mcfg.plane_resolution)

    chained_carry("  grid insert corner (4096)", ins_c, gm2.corner)
    chained_carry("  grid insert surf (16384)", ins_s, gm2.surf)

    r = jnp.asarray([525.0, 525.0, 275.0], jnp.float32)

    def ev_c(g):
        return grid_evict(g, t0v, r)

    def ev_s(g):
        return grid_evict(g, t0v, r)

    chained_carry("  grid evict corner", ev_c, gm2.corner)
    chained_carry("  grid evict surf", ev_s, gm2.surf)


if __name__ == "__main__":
    main()
