"""Which stage breaks batch (vmap-over-streams) scaling? Chained per-stage
device times at B=1 vs B=4 for each pipeline stage. A stage whose B=4 time
is ~4x its B=1 time is the scaling bottleneck (descriptor-bound gathers /
scatters scale with rows; latency-chained arithmetic should amortize)."""

import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr
from vloam_tpu.lidar.loam_step import LoamState, loam_frame_step_feats, \
    batch_states
from vloam_tpu.lidar.mapping import GridMap, solve_mapping
from vloam_tpu.lidar.odometry import solve_lo
from vloam_tpu.lidar.voxel import voxel_downsample
from vloam_tpu.runtime.profiling import fence

ITERS = 32


def chained_carry(label, step, init_carry, iters=ITERS):
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
    print(f"{label:52s} {ms:9.2f} ms/iter", flush=True)
    return ms


def main():
    cfg = kitti_hdl64()
    B = 4
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(3, speed=1.1, yaw_rate=0.01)
    elev = jnp.asarray(np.radians(synthetic.hdl64_elevations(64)), jnp.float32)
    rimgs = [jnp.asarray(synthetic.simulate_scan_polar(
        scene, T, n_scans=64, n_azimuth=1800, seed=k))
        for k, T in enumerate(poses)]
    rimg = rimgs[2]
    rimg_b = jnp.broadcast_to(rimg, (B,) + rimg.shape).copy()

    regp = jax.jit(lambda r: sr.register_scan_polar(r, elev, cfg.lidar,
                                                    cfg.scanreg))
    feats0 = regp(rimgs[0])
    feats1 = regp(rimgs[1])
    q0 = jnp.asarray([0, 0, 0, 1.0], jnp.float32)
    t0v = jnp.zeros(3, jnp.float32)

    # --- scanreg polar ---
    def reg_step(c):
        f = sr.register_scan_polar(rimg + c.astype(jnp.uint16) * 0,
                                   elev, cfg.lidar, cfg.scanreg)
        return c + f.sharp.xyz[0, 0] * 0

    chained_carry("scanreg_polar B=1", reg_step, jnp.float32(0))

    def reg_step_b(c):
        f = jax.vmap(lambda r: sr.register_scan_polar(
            r, elev, cfg.lidar, cfg.scanreg))(rimg_b)
        return c + f.sharp.xyz[0, 0, 0] * 0

    chained_carry(f"scanreg_polar B={B}", reg_step_b, jnp.float32(0))

    # --- solve_lo ---
    def lo_step(c):
        q, t, _, _ = solve_lo(feats1.sharp, feats1.flat,
                              feats0.less_sharp_slab, feats0.less_flat_slab,
                              q0, t0v + c, cfg.lo)
        return c + q[0] * 0

    chained_carry("solve_lo B=1", lo_step, jnp.float32(0))

    def lo_step_b(c):
        def one(_):
            return solve_lo(feats1.sharp, feats1.flat, feats0.less_sharp_slab,
                            feats0.less_flat_slab, q0, t0v + c, cfg.lo)[0]
        q = jax.vmap(one)(jnp.arange(B))
        return c + q[0, 0] * 0

    chained_carry(f"solve_lo B={B}", lo_step_b, jnp.float32(0))

    # --- voxel stacks ---
    def vox_step(c):
        cx, _, _, cm = voxel_downsample(feats1.less_sharp.xyz + c,
                                        feats1.less_sharp.mask,
                                        cfg.mapping.line_resolution,
                                        cfg.mapping.corner_stack_cap)
        sx2, _, _, sm = voxel_downsample(feats1.less_flat.xyz + c,
                                         feats1.less_flat.mask,
                                         cfg.mapping.plane_resolution,
                                         cfg.mapping.surf_stack_cap)
        return c + cx[0, 0] * 0 + sx2[0, 0] * 0

    chained_carry("voxel stacks B=1", vox_step, jnp.float32(0))

    def vox_step_b(c):
        def one(_):
            cx, _, _, _ = voxel_downsample(feats1.less_sharp.xyz + c,
                                           feats1.less_sharp.mask,
                                           cfg.mapping.line_resolution,
                                           cfg.mapping.corner_stack_cap)
            sx2, _, _, _ = voxel_downsample(feats1.less_flat.xyz + c,
                                            feats1.less_flat.mask,
                                            cfg.mapping.plane_resolution,
                                            cfg.mapping.surf_stack_cap)
            return cx[0, 0] * 0 + sx2[0, 0] * 0
        r = jax.vmap(one)(jnp.arange(B))
        return c + r[0]

    chained_carry(f"voxel stacks B={B}", vox_step_b, jnp.float32(0))

    # --- mapping ---
    vdc = jax.jit(lambda x, m: voxel_downsample(
        x, m, cfg.mapping.line_resolution, cfg.mapping.corner_stack_cap))
    vds = jax.jit(lambda x, m: voxel_downsample(
        x, m, cfg.mapping.plane_resolution, cfg.mapping.surf_stack_cap))
    c_xyz, _, _, c_m = vdc(feats1.less_sharp.xyz, feats1.less_sharp.mask)
    s_xyz, _, _, s_m = vds(feats1.less_flat.xyz, feats1.less_flat.mask)

    def map_step(cb):
        new_cube, _, _, _ = solve_mapping(cb, c_xyz, c_m, s_xyz, s_m, q0,
                                          t0v, cfg.mapping)
        return new_cube

    chained_carry("solve_mapping B=1", map_step, GridMap.create(cfg.mapping))

    def map_step_b(cubes):
        def one(cb):
            new_cube, _, _, _ = solve_mapping(cb, c_xyz, c_m, s_xyz, s_m,
                                              q0, t0v, cfg.mapping)
            return new_cube
        return jax.vmap(one)(cubes)

    one_cube = GridMap.create(cfg.mapping)
    cubes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), one_cube)
    chained_carry(f"solve_mapping B={B}", map_step_b, cubes)

    # --- full frame ---
    def full_b(sts):
        def one(st):
            f = sr.register_scan_polar(rimg, elev, cfg.lidar, cfg.scanreg)
            s2, _ = loam_frame_step_feats(st, f, q0, t0v, jnp.bool_(False),
                                          cfg)
            return s2
        return jax.vmap(one)(sts)

    chained_carry(f"full polar frame B={B}", full_b,
                  batch_states(cfg, B), iters=8)


if __name__ == "__main__":
    main()
