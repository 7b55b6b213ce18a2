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
from vloam_tpu.lidar.mapping import GridMap, solve_mapping
from vloam_tpu.lidar.odometry import solve_lo
from vloam_tpu.lidar.voxel import voxel_downsample
from vloam_tpu.runtime.profiling import fence

ITERS = 64


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
        feats1.sharp, feats1.flat, feats0.less_sharp_slab,
        feats0.less_flat_slab)

    vdc = jax.jit(lambda x, m: voxel_downsample(
        x, m, cfg.mapping.line_resolution, cfg.mapping.corner_stack_cap))
    vds = jax.jit(lambda x, m: voxel_downsample(
        x, m, cfg.mapping.plane_resolution, cfg.mapping.surf_stack_cap))
    c_xyz, _, _, c_m = vdc(feats1.less_sharp.xyz, feats1.less_sharp.mask)
    s_xyz, _, _, s_m = vds(feats1.less_flat.xyz, feats1.less_flat.mask)

    # thread the map through the carry (constants would be a huge upload)
    cube = GridMap.create(cfg.mapping)

    def map_step(cb):
        new_cube, q_w, t_w, _ = solve_mapping(
            cb, c_xyz, c_m, s_xyz, s_m, q0, t0v, cfg.mapping)
        return new_cube

    chained_carry("solve_mapping (map carried)", map_step, cube)

    st = LoamState.create(cfg)

    def full_step(s):
        s2, _ = loam_frame_step(s, scans[2][0], scans[2][1], q0, t0v,
                                jnp.asarray(False), cfg)
        return s2

    chained_carry("loam_frame_step (full frame)", full_step, st, iters=16)

    from vloam_tpu.lidar.scan_registration import register_scan_polar
    from vloam_tpu.data.synthetic import hdl64_elevations, simulate_scan_polar

    elev = jnp.asarray(np.radians(hdl64_elevations(cfg.lidar.n_scans)),
                       jnp.float32)
    rimg = jnp.asarray(simulate_scan_polar(scene, poses[2],
                                           n_scans=cfg.lidar.n_scans,
                                           n_azimuth=1800, seed=2))
    chained("register_scan_polar", lambda r: register_scan_polar(
        r, elev, cfg.lidar, cfg.scanreg), rimg.astype(jnp.float32))

    from vloam_tpu.lidar.loam_step import loam_frame_step_feats

    def full_step_polar(s):
        feats = register_scan_polar(rimg, elev, cfg.lidar, cfg.scanreg)
        s2, _ = loam_frame_step_feats(s, feats, q0, t0v, jnp.asarray(False),
                                      cfg)
        return s2

    chained_carry("polar full frame (scanreg+LO+MO)", full_step_polar,
                  LoamState.create(cfg), iters=16)


if __name__ == "__main__":
    main()
