"""Fine-grained chained profiler for the mapping stage (and scanreg variants).

Same methodology as profile_chained.py: each sub-op runs ITERS times inside
one jitted lax.scan with a threaded data dependency and a single fence, so
the number is true device time, not tunnel round trips. Run ALONE on the
chip.
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
from vloam_tpu.lidar.gridmap import (grid_evict, grid_gather, grid_insert,
                                     grid_knn)
from vloam_tpu.lidar.mapping import (GridMap, _corner_terms, _retract,
                                     _surf_terms, solve_mapping)
from vloam_tpu.lidar.odometry import solve_lo
from vloam_tpu.lidar.voxel import voxel_downsample
from vloam_tpu.runtime.profiling import fence
from vloam_tpu.solver.lm import ResidualFamily, lm_solve
from vloam_tpu.geometry import so3

ITERS = 32
_EPS = 1e-9


def chained(label, fn, *args, iters=ITERS):
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

    fence(run())
    t0 = time.perf_counter()
    out = run()
    fence(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {ms:9.2f} ms/iter", flush=True)
    return ms


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
    print(f"{label:44s} {ms:9.2f} ms/iter", flush=True)
    return ms


def main():
    cfg = kitti_hdl64()
    mcfg = cfg.mapping
    print(f"devices: {jax.devices()}", flush=True)

    scene = synthetic.urban_scene(0, extent=80.0)
    n_fill = 8
    poses = synthetic.drive_trajectory(n_fill + 1, speed=1.1, yaw_rate=0.01)
    regj = jax.jit(lambda s, n: sr.register_scan(s, n, cfg.lidar, cfg.scanreg))
    vdc = jax.jit(lambda x, m: voxel_downsample(
        x, m, mcfg.line_resolution, mcfg.corner_stack_cap))
    vds = jax.jit(lambda x, m: voxel_downsample(
        x, m, mcfg.plane_resolution, mcfg.surf_stack_cap))

    cube = GridMap.create(mcfg)
    stacks = None
    for k, T in enumerate(poses):
        pts = synthetic.simulate_scan(scene, T, n_scans=cfg.lidar.n_scans,
                                      n_azimuth=1800, noise=0.01, seed=k)
        padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
        feats = regj(jnp.asarray(padded), jnp.int32(n))
        c_xyz, _, _, c_m = vdc(feats.less_sharp.xyz, feats.less_sharp.mask)
        s_xyz, _, _, s_m = vds(feats.less_flat.xyz, feats.less_flat.mask)
        q0 = jnp.asarray(
            np.concatenate([np.zeros(3), [1.0]]), jnp.float32)
        t0v = jnp.asarray(T[:3, 3], jnp.float32)
        pc = so3.quat_rotate(q0, c_xyz) + t0v
        ps = so3.quat_rotate(q0, s_xyz) + t0v
        cube = GridMap(
            corner=grid_insert(cube.corner, pc, c_m, mcfg.corner_cell,
                               mcfg.line_resolution),
            surf=grid_insert(cube.surf, ps, s_m, mcfg.surf_cell,
                             mcfg.plane_resolution),
            center=cube.center,
        )
        stacks = (c_xyz, c_m, s_xyz, s_m, q0, t0v)

    c_xyz, c_m, s_xyz, s_m, q0, t0v = stacks
    print(f"map corners={int(cube.corner.n_live)} "
          f"surfs={int(cube.surf.n_live)} "
          f"stack c={int(jnp.sum(c_m))} s={int(jnp.sum(s_m))}", flush=True)

    x0 = jnp.concatenate([q0, t0v])

    # --- kNN probes ---
    chained("grid_knn corner (2048 q x 256 cand)",
            lambda qs: grid_knn(cube.corner, qs, mcfg.corner_cell, k=mcfg.knn),
            c_xyz + t0v)
    chained("grid_knn surf (8192 q x 128 cand)",
            lambda qs: grid_knn(cube.surf, qs, mcfg.surf_cell, k=mcfg.knn),
            s_xyz + t0v)

    # --- terms (knn + eig / plane fit) on pre-gathered candidates ---
    cand_c0 = jax.jit(lambda q: grid_gather(cube.corner, q, mcfg.corner_cell))(
        c_xyz + t0v)
    cand_s0 = jax.jit(lambda q: grid_gather(cube.surf, q, mcfg.surf_cell))(
        s_xyz + t0v)
    chained("_corner_terms (pre-gathered)", lambda xx: _corner_terms(
        c_xyz, c_m, cand_c0, xx, mcfg), x0)
    chained("_surf_terms (pre-gathered)", lambda xx: _surf_terms(
        s_xyz, s_m, cand_s0, xx, mcfg), x0)

    # --- LM with fixed terms (one round's solver cost) ---
    a, b, de, v_c = jax.jit(lambda xx: _corner_terms(
        c_xyz, c_m, cand_c0, xx, mcfg))(x0)
    n_hat, nood, v_s = jax.jit(lambda xx: _surf_terms(
        s_xyz, s_m, cand_s0, xx, mcfg))(x0)

    def lm_once(xx):
        def make_families(x):
            def edge_fn(delta):
                qd = so3.quat_multiply(x[:4], so3.quat_from_axis_angle(delta[:3]))
                td = x[4:] + delta[3:]
                pw = so3.quat_rotate(qd, c_xyz) + td
                nu = jnp.cross(pw - a, pw - b)
                return nu / jnp.maximum(de, _EPS)[:, None]

            def plane_fn(delta):
                qd = so3.quat_multiply(x[:4], so3.quat_from_axis_angle(delta[:3]))
                td = x[4:] + delta[3:]
                pw = so3.quat_rotate(qd, s_xyz) + td
                return (jnp.sum(pw * n_hat, axis=-1) + nood)[:, None]

            return [ResidualFamily(edge_fn, v_c.astype(jnp.float32)),
                    ResidualFamily(plane_fn, v_s.astype(jnp.float32))]

        return lm_solve(make_families, _retract, xx, dim=6,
                        iterations=mcfg.gn_iterations,
                        huber_delta=mcfg.huber_delta)

    chained("lm_solve 4 iters (fixed terms)", lm_once, x0)

    # --- map mutation ---
    pc = so3.quat_rotate(q0, c_xyz) + t0v

    def ins_c(cb):
        return grid_insert(cb, pc, c_m, mcfg.corner_cell, mcfg.line_resolution)

    chained_carry("grid_insert corner", ins_c, cube.corner)

    ps = so3.quat_rotate(q0, s_xyz) + t0v

    def ins_s(sb):
        return grid_insert(sb, ps, s_m, mcfg.surf_cell, mcfg.plane_resolution)

    chained_carry("grid_insert surf", ins_s, cube.surf)

    radius = jnp.asarray([525.0, 525.0, 275.0], jnp.float32)

    def ev(cb):
        return grid_evict(cb, t0v, radius)

    chained_carry("grid_evict corner", ev, cube.corner)

    def evs(sb):
        return grid_evict(sb, t0v, radius)

    chained_carry("grid_evict surf", evs, cube.surf)

    # --- full solve_mapping, map threaded ---
    def map_step(cb):
        new_cube, q_w, t_w, _ = solve_mapping(
            cb, c_xyz, c_m, s_xyz, s_m, q0, t0v, mcfg)
        return new_cube

    chained_carry("solve_mapping (full)", map_step, cube)

    # --- scanreg variants ---
    pts = synthetic.simulate_scan(scene, poses[-1], n_scans=cfg.lidar.n_scans,
                                  n_azimuth=1800, noise=0.01, seed=99)
    padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
    chained("register_scan (xyz)", lambda s: sr.register_scan(
        s, jnp.int32(n), cfg.lidar, cfg.scanreg), jnp.asarray(padded))

    rimg = synthetic.simulate_scan_polar(scene, poses[-1],
                                         n_scans=cfg.lidar.n_scans,
                                         n_azimuth=1800, noise=0.01, seed=99)
    elev = jnp.asarray(
        np.radians(synthetic.hdl64_elevations(cfg.lidar.n_scans)), jnp.float32)

    def reg_polar(e):
        return sr.register_scan_polar(jnp.asarray(rimg), e, cfg.lidar,
                                      cfg.scanreg, 0.005)

    chained("register_scan_polar", reg_polar, elev)


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def knn_among_packed(cand, queries, k=5, clip_d=64.0):
    """k smallest via k iterated packed single-pass mins."""
    diff = cand - queries.T[:, :, None]
    d = jnp.sum(diff * diff, axis=0)  # [Q, C]
    C = d.shape[1]
    bits = max(1, (C - 1).bit_length())
    scale = float(1 << (30 - bits)) / clip_d
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    packed = ((jnp.minimum(d, clip_d * 0.999999) * scale).astype(jnp.int32)
              << bits) | col
    ds, idxs = [], []
    for _ in range(k):
        m = jnp.min(packed, axis=1)  # [Q]
        idx = m & ((1 << bits) - 1)
        ds.append((m >> bits).astype(jnp.float32) / scale)
        idxs.append(idx)
        packed = jnp.where(col == idx[:, None], jnp.int32(2**30), packed)
    ni = jnp.stack(idxs, axis=1)
    near = jnp.take_along_axis(cand, ni[None, :, :], axis=2)
    return jnp.stack(ds, axis=1), jnp.moveaxis(near, 0, 2)


def extra():
    cfg = kitti_hdl64().mapping
    rng = np.random.default_rng(0)
    from vloam_tpu.lidar.gridmap import grid_create, grid_insert, grid_gather
    g = grid_create(cfg.map_n_buckets, cfg.surf_bucket_cap)
    pts = jnp.asarray(rng.uniform(-60, 60, (50000, 3)).astype(np.float32))
    g = grid_insert(g, pts, jnp.ones(len(pts), bool), cfg.surf_cell,
                    cfg.plane_resolution)
    q = jnp.asarray(rng.uniform(-50, 50, (6144, 3)).astype(np.float32))
    cand = jax.jit(lambda qq: grid_gather(g, qq, cfg.surf_cell))(q)
    from vloam_tpu.lidar.gridmap import knn_among
    chained("knn_among top_k (6144 x 128)", lambda qq: knn_among(
        grid_gather(g, qq, cfg.surf_cell), qq, 5)[0], q)
    chained("knn_among packed (6144 x 128)", lambda qq: knn_among_packed(
        grid_gather(g, qq, cfg.surf_cell), qq, 5)[0], q)
    chained("gather only (6144)", lambda qq: grid_gather(
        g, qq, cfg.surf_cell)[0], q)


if __name__ == "__main__" and "--extra" in sys.argv:
    extra()
