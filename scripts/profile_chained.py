"""Chained per-stage profiler: true device time, one dispatch per stage.

Each stage runs `iters` times inside ONE jitted lax.scan with a data
dependency threaded between iterations, and a single fence at the end.
Calibration (scripts/calibrate_timing.py) showed: (a) every host->device
dispatch on the axon backend costs ~30 ms and does NOT pipeline, so
per-call timing measures only the tunnel; (b) scan-chained timing matches
the matmul roofline. Run this ALONE on the chip — concurrent processes
inflate every number.
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
from vloam_tpu.lidar.mapping import CubeMap, solve_mapping
from vloam_tpu.lidar.odometry import solve_lo
from vloam_tpu.lidar.voxel import voxel_downsample
from vloam_tpu.runtime.profiling import fence

ITERS = 8


def chained(label, fn, *args, iters=ITERS):
    """fn(*args) -> pytree; first float arg gets a zero-valued carry added."""

    def body(carry, _):
        perturbed, done = [], False
        for a in args:
            if (not done and hasattr(a, "dtype")
                    and jnp.issubdtype(a.dtype, jnp.floating)):
                perturbed.append(a + carry)
                done = True
            else:
                perturbed.append(a)
        out = fn(*perturbed)
        leaf = [x for x in jax.tree_util.tree_leaves(out)
                if jnp.issubdtype(x.dtype, jnp.floating)][0]
        return (leaf.reshape(-1)[0] * 0.0).astype(jnp.float32), None

    @jax.jit
    def run():
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    fence(run())  # warmup MUST be fenced: dispatch is async
    t0 = time.perf_counter()
    out = run()
    fence(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {ms:9.2f} ms/iter", flush=True)
    return ms


def chained_carry(label, step, init_carry, iters=ITERS):
    """step(carry) -> carry; carry is a real pytree threaded through."""

    @jax.jit
    def run(c0):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c

    out = run(init_carry)
    fence(out)
    t0 = time.perf_counter()
    out = run(out)
    fence(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {ms:9.2f} ms/iter", flush=True)
    return ms


def main():
    cfg = kitti_hdl64()

    x = jnp.zeros((8,), jnp.float32)
    y = jax.jit(lambda v: v + 1)(x)
    fence(y)
    t0 = time.perf_counter()
    for _ in range(10):
        fence(y)
    print(f"{'dispatch+fence overhead':44s} "
          f"{(time.perf_counter() - t0) / 10 * 1e3:9.2f} ms", flush=True)

    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(3, speed=1.1, yaw_rate=0.01)
    scans = []
    for k, T in enumerate(poses):
        pts = synthetic.simulate_scan(scene, T, n_scans=cfg.lidar.n_scans,
                                      n_azimuth=1800, noise=0.01, seed=k)
        padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
        scans.append((jnp.asarray(padded), jnp.int32(n)))

    regj = jax.jit(lambda s, n: sr.register_scan(s, n, cfg.lidar, cfg.scanreg))
    feats0 = regj(*scans[0])
    feats1 = regj(*scans[1])

    chained("register_scan", lambda s: sr.register_scan(
        s, scans[1][1], cfg.lidar, cfg.scanreg), scans[1][0])

    chained("voxel 8192->4096 (corner stack)", lambda x, m: voxel_downsample(
        x, m, cfg.mapping.line_resolution, cfg.mapping.corner_stack_cap),
        feats1.less_sharp.xyz, feats1.less_sharp.mask)
    chained("voxel 32768->16384 (surf stack)", lambda x, m: voxel_downsample(
        x, m, cfg.mapping.plane_resolution, cfg.mapping.surf_stack_cap),
        feats1.less_flat.xyz, feats1.less_flat.mask)

    q0 = jnp.asarray([0, 0, 0, 1.0], jnp.float32)
    t0v = jnp.zeros(3, jnp.float32)
    chained("solve_lo", lambda a, b, c, d: solve_lo(
        a, b, c, d, q0, t0v, cfg.lo)[0],
        feats1.sharp, feats1.flat, feats0.less_sharp, feats0.less_flat)

    vdc = jax.jit(lambda x, m: voxel_downsample(
        x, m, cfg.mapping.line_resolution, cfg.mapping.corner_stack_cap))
    vds = jax.jit(lambda x, m: voxel_downsample(
        x, m, cfg.mapping.plane_resolution, cfg.mapping.surf_stack_cap))
    c_xyz, _, _, c_m = vdc(feats1.less_sharp.xyz, feats1.less_sharp.mask)
    s_xyz, _, _, s_m = vds(feats1.less_flat.xyz, feats1.less_flat.mask)

    # thread the cube through the carry (constants would be a 300 MB upload)
    cube = CubeMap.create(cfg.mapping)

    def map_step(cb):
        new_cube, q_w, t_w, _ = solve_mapping(
            cb, c_xyz, c_m, s_xyz, s_m, q0, t0v, cfg.mapping)
        return new_cube

    chained_carry("solve_mapping (map carried)", map_step, cube)

    # --- solve_mapping sub-stages ---
    from vloam_tpu.lidar import mapping as mp
    from vloam_tpu.lidar.hashgrid import build_cell_grid, cell_grid_knn

    mcfg = cfg.mapping
    # populate a window once
    cube2 = map_step(map_step(cube))
    center = mp._cube_coord(t0v, mcfg.cube_size)

    def gw_step(cb):
        slots, coords, c_p, c_mk, s_p, s_mk = mp.gather_window(cb, center, mcfg)
        # touch outputs so nothing is elided; return cb to keep carry shape
        return jax.tree_util.tree_map(
            lambda a: a, cb)._replace(corner_cnt=cb.corner_cnt + 0 * jnp.sum(c_mk.astype(jnp.int32)))

    chained_carry("  gather_window", gw_step, cube2)

    slots, coords, c_p, c_mk, s_p, s_mk = jax.jit(
        lambda cb: mp.gather_window(cb, center, mcfg))(cube2)
    flat_c, flat_cm = c_p.reshape(-1, 3), c_mk.reshape(-1)
    flat_s, flat_sm = s_p.reshape(-1, 3), s_mk.reshape(-1)

    chained("  build grid (corner 76.8k)", lambda p, m: build_cell_grid(
        p, m, mcfg.grid_cell, cap=mcfg.grid_corner_cap), flat_c, flat_cm)
    chained("  build grid (surf 307k)", lambda p, m: build_cell_grid(
        p, m, mcfg.grid_cell, cap=mcfg.grid_surf_cap), flat_s, flat_sm)

    grid_c = jax.jit(lambda p, m: build_cell_grid(
        p, m, mcfg.grid_cell, cap=mcfg.grid_corner_cap))(flat_c, flat_cm)
    grid_s = jax.jit(lambda p, m: build_cell_grid(
        p, m, mcfg.grid_cell, cap=mcfg.grid_surf_cap))(flat_s, flat_sm)

    chained("  grid knn (4096 corner q)", lambda q: cell_grid_knn(
        grid_c, q, k=mcfg.knn)[0], c_xyz)
    chained("  grid knn (16384 surf q)", lambda q: cell_grid_knn(
        grid_s, q, k=mcfg.knn)[0], s_xyz)

    x0 = jnp.concatenate([q0, t0v])
    chained("  corner terms (assoc+eig)", lambda cx: mp._corner_terms(
        cx, c_m, flat_c, flat_cm, x0, mcfg, grid_c)[0], c_xyz)
    chained("  surf terms (assoc+planefit)", lambda sx: mp._surf_terms(
        sx, s_m, flat_s, flat_sm, x0, mcfg, grid_s)[0], s_xyz)

    def insert_step(cb):
        return mp._insert_and_filter(
            cb, slots, coords, c_p, c_mk, s_p, s_mk,
            c_xyz, c_m, s_xyz, s_m, q0, t0v, center, mcfg)

    chained_carry("  insert_and_filter", insert_step, cube2)

    st = LoamState.create(cfg)

    def full_step(s):
        s2, _ = loam_frame_step(s, scans[2][0], scans[2][1], q0, t0v,
                                jnp.asarray(False), cfg)
        return s2

    chained_carry("loam_frame_step (full frame)", full_step, st, iters=6)


if __name__ == "__main__":
    main()
