"""Drill into solve_mapping's vmap scaling: per-sub-stage chained device
times at B=1 vs B=4 (gather / terms+LM / insert / evict-select)."""

import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr
from vloam_tpu.lidar.gridmap import grid_gather, grid_insert, grid_evict
from vloam_tpu.lidar.mapping import (GridMap, _corner_terms, _surf_terms,
                                     map_update, solve_mapping)
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
    cfg = kitti_hdl64().mapping
    lidar_cfg = kitti_hdl64()
    B = 4
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(2, speed=1.1, yaw_rate=0.01)
    elev = jnp.asarray(np.radians(synthetic.hdl64_elevations(64)), jnp.float32)
    rimg = jnp.asarray(synthetic.simulate_scan_polar(
        scene, poses[1], n_scans=64, n_azimuth=1800, seed=1))
    regp = jax.jit(lambda r: sr.register_scan_polar(
        r, elev, lidar_cfg.lidar, lidar_cfg.scanreg))
    feats = regp(rimg)
    vdc = jax.jit(lambda x, m: voxel_downsample(x, m, cfg.line_resolution,
                                                cfg.corner_stack_cap))
    vds = jax.jit(lambda x, m: voxel_downsample(x, m, cfg.plane_resolution,
                                                cfg.surf_stack_cap))
    c_xyz, _, _, c_m = vdc(feats.less_sharp.xyz, feats.less_sharp.mask)
    s_xyz, _, _, s_m = vds(feats.less_flat.xyz, feats.less_flat.mask)
    q0 = jnp.asarray([0, 0, 0, 1.0], jnp.float32)
    t0v = jnp.zeros(3, jnp.float32)

    # build a populated map (a few inserts)
    cube = GridMap.create(cfg)
    for _ in range(3):
        cube = map_update(cube, c_xyz, c_m, s_xyz, s_m, q0, t0v, cfg)
    cubes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), cube)

    def stack_batched(x):
        return jnp.broadcast_to(x, (B,) + x.shape).copy()

    cb_xyz, cb_m = stack_batched(c_xyz), stack_batched(c_m)
    sb_xyz, sb_m = stack_batched(s_xyz), stack_batched(s_m)

    # --- gather only ---
    def gath1(c):
        cand_c = grid_gather(cube.corner, c_xyz + c, cfg.corner_cell)
        cand_s = grid_gather(cube.surf, s_xyz + c, cfg.surf_cell)
        return c + cand_c[0, 0, 0] * 0 + cand_s[0, 0, 0] * 0

    chained_carry("grid_gather B=1", gath1, jnp.float32(0))

    def gathB(carry):
        cbs, c = carry
        def one(cb, cx, sx):
            cand_c = grid_gather(cb.corner, cx + c, cfg.corner_cell)
            cand_s = grid_gather(cb.surf, sx + c, cfg.surf_cell)
            return cand_c[0, 0, 0] * 0 + cand_s[0, 0, 0] * 0
        r = jax.vmap(one)(cbs, cb_xyz, sb_xyz)
        return cbs, c + r[0]

    chained_carry(f"grid_gather B={B}", gathB, (cubes, jnp.float32(0)))

    # --- terms + LM (pre-gathered candidates) ---
    candc = grid_gather(cube.corner, c_xyz, cfg.corner_cell)
    cands = grid_gather(cube.surf, s_xyz, cfg.surf_cell)
    x0 = jnp.concatenate([q0, t0v])

    def terms1(c):
        x = x0.at[4].add(c * 0)
        a, b, de, vc = _corner_terms(c_xyz, c_m, candc, x, cfg)
        nh, nd, vs = _surf_terms(s_xyz, s_m, cands, x, cfg)
        return c + a[0, 0] * 0 + nh[0, 0] * 0

    chained_carry("corner+surf terms B=1", terms1, jnp.float32(0))

    candc_b = stack_batched(candc)
    cands_b = stack_batched(cands)

    def termsB(c):
        def one(cc, cs, cx, sx):
            x = x0.at[4].add(c * 0)
            a, b, de, vc = _corner_terms(cx, c_m, cc, x, cfg)
            nh, nd, vs = _surf_terms(sx, s_m, cs, x, cfg)
            return a[0, 0] * 0 + nh[0, 0] * 0
        r = jax.vmap(one)(candc_b, cands_b, cb_xyz, sb_xyz)
        return c + r[0]

    chained_carry(f"corner+surf terms B={B}", termsB, jnp.float32(0))

    # --- full solve (no update) ---
    def solve1(c):
        _, qw, tw, _ = solve_mapping(cube, c_xyz + c, c_m, s_xyz + c, s_m,
                                     q0, t0v, cfg)
        return c + qw[0] * 0

    chained_carry("solve_mapping-no-carry B=1", solve1, jnp.float32(0))

    # --- insert only ---
    def ins1(g):
        return grid_insert(g, c_xyz, c_m, cfg.corner_cell,
                           cfg.line_resolution)

    chained_carry("grid_insert(corner stack) B=1", ins1, cube.corner)

    def insB(gs):
        return jax.vmap(lambda g, p: grid_insert(
            g, p, c_m, cfg.corner_cell, cfg.line_resolution))(gs, cb_xyz)

    chained_carry(f"grid_insert(corner stack) B={B}", insB, cubes.corner)

    # --- surf insert (6144 stack) ---
    def insS(gs):
        return jax.vmap(lambda g, p: grid_insert(
            g, p, s_m, cfg.surf_cell, cfg.plane_resolution))(gs, sb_xyz)

    chained_carry(f"grid_insert(surf stack) B={B}", insS, cubes.surf)

    # --- evict under vmap (the cond->select suspicion) ---
    r3 = jnp.asarray([500.0, 500.0, 250.0], jnp.float32)

    def ev1(g):
        return grid_evict(g, t0v, r3)

    chained_carry("grid_evict(corner) B=1", ev1, cube.corner)

    def evB(gs):
        return jax.vmap(lambda g: grid_evict(g, t0v, r3))(gs)

    chained_carry(f"grid_evict(corner) B={B}", evB, cubes.corner)

    # --- full map_update ---
    def upd1(g):
        return map_update(g, c_xyz, c_m, s_xyz, s_m, q0, t0v, cfg)

    chained_carry("map_update B=1", upd1, cube)

    def updB(gs):
        return jax.vmap(lambda g, cx, sx: map_update(
            g, cx, c_m, sx, s_m, q0, t0v, cfg))(gs, cb_xyz, sb_xyz)

    chained_carry(f"map_update B={B}", updB, cubes)


if __name__ == "__main__":
    main()
