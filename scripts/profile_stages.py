"""Per-stage device-time profile of the LOAM pipeline with REAL fences.

block_until_ready is a no-op on the axon backend, so every number here is
measured by fetching a tiny output leaf to host (runtime.profiling.fence).
Run on the target chip to direct optimization.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr
from vloam_tpu.lidar.loam_step import LoamState, loam_frame_step
from vloam_tpu.lidar.mapping import solve_mapping, GridMap
from vloam_tpu.lidar.odometry import solve_lo
from vloam_tpu.lidar.voxel import voxel_downsample
from vloam_tpu.runtime.profiling import fence


def timed(label, fn, *args, iters=5, **kw):
    out = fn(*args, **kw)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
        fence(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:38s} {ms:9.2f} ms")
    return out, ms


def main():
    cfg = kitti_hdl64()
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(3, speed=1.1, yaw_rate=0.01)
    scans = []
    for k, T in enumerate(poses):
        pts = synthetic.simulate_scan(scene, T, n_scans=cfg.lidar.n_scans,
                                      n_azimuth=1800, noise=0.01, seed=k)
        padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
        scans.append((jnp.asarray(padded), jnp.int32(n)))
    print(f"scan sizes ~{int(np.mean([int(n) for _, n in scans]))} pts")

    reg = jax.jit(lambda s, n: sr.register_scan(s, n, cfg.lidar, cfg.scanreg))
    feats0, _ = timed("register_scan", reg, *scans[0])
    feats1, _ = timed("register_scan (2nd frame)", reg, *scans[1])

    vd_c = jax.jit(lambda x, m: voxel_downsample(
        x, m, cfg.mapping.line_resolution, cfg.mapping.corner_stack_cap))
    vd_s = jax.jit(lambda x, m: voxel_downsample(
        x, m, cfg.mapping.plane_resolution, cfg.mapping.surf_stack_cap))
    (c_xyz, _, _, c_m), _ = timed("voxel_downsample corners", vd_c,
                                  feats1.less_sharp.xyz, feats1.less_sharp.mask)
    (s_xyz, _, _, s_m), _ = timed("voxel_downsample surfs", vd_s,
                                  feats1.less_flat.xyz, feats1.less_flat.mask)

    q0 = jnp.asarray([0, 0, 0, 1.0], jnp.float32)
    t0v = jnp.zeros(3, jnp.float32)
    lo = jax.jit(lambda a, b, c, d: solve_lo(a, b, c, d, q0, t0v, cfg.lo))
    timed("solve_lo", lo, feats1.sharp, feats1.flat,
          feats0.less_sharp_slab, feats0.less_flat_slab)

    # empty map: the `enough` cond skips the GN solve -> insert-only cost;
    # then populate and time the full assoc+GN+insert path
    cube = GridMap.create(cfg.mapping)
    smap = jax.jit(lambda cb, cx, cm, sx, smk: solve_mapping(
        cb, cx, cm, sx, smk, q0, t0v, cfg.mapping))
    (cube, _, _, _), _ = timed("solve_mapping (empty: insert only)", smap,
                               cube, c_xyz, c_m, s_xyz, s_m)
    cube, _, _, _ = smap(cube, c_xyz, c_m, s_xyz, s_m)
    fence(cube)
    timed("solve_mapping (full assoc+GN+insert)", smap, cube, c_xyz, c_m,
          s_xyz, s_m)

    # one full fused frame step for reference
    st = LoamState.create(cfg)
    step = jax.jit(lambda s, sc, n: loam_frame_step(
        s, sc, n, q0, t0v, jnp.asarray(False), cfg))
    st, _ = step(st, *scans[0])
    fence(st)
    st, _ = step(st, *scans[1])
    fence(st)
    timed("loam_frame_step (full frame)", step, st, *scans[2])


if __name__ == "__main__":
    main()
