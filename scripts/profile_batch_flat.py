"""Per-sub-stage chained device times of the FLAT-batched mapping
(batch_mapping.py) at B=4, vs the single-stream equivalents."""

import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import batch_mapping as bm
from vloam_tpu.lidar import scan_registration as sr
from vloam_tpu.lidar.loam_step import BatchLoamState, batch_frame_step_feats
from vloam_tpu.lidar.odometry import solve_lo
from vloam_tpu.lidar.voxel import voxel_downsample
from vloam_tpu.runtime.profiling import fence

ITERS = 24


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
    full = kitti_hdl64()
    cfg = full.mapping
    B = 4
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(2, speed=1.1, yaw_rate=0.01)
    elev = jnp.asarray(np.radians(synthetic.hdl64_elevations(64)), jnp.float32)
    rimg = jnp.asarray(synthetic.simulate_scan_polar(
        scene, poses[1], n_scans=64, n_azimuth=1800, seed=1))
    rimg_b = jnp.broadcast_to(rimg, (B,) + rimg.shape).copy()
    regp = jax.jit(lambda r: sr.register_scan_polar(r, elev, full.lidar,
                                                    full.scanreg))
    feats = regp(rimg)
    vdc = jax.jit(lambda x, m: voxel_downsample(x, m, cfg.line_resolution,
                                                cfg.corner_stack_cap))
    vds = jax.jit(lambda x, m: voxel_downsample(x, m, cfg.plane_resolution,
                                                cfg.surf_stack_cap))
    c_xyz, _, _, c_m = vdc(feats.less_sharp.xyz, feats.less_sharp.mask)
    s_xyz, _, _, s_m = vds(feats.less_flat.xyz, feats.less_flat.mask)

    def sb(x):
        return jnp.broadcast_to(x, (B,) + x.shape).copy()

    cb_xyz, cb_m = sb(c_xyz), sb(c_m)
    sb_xyz, sb_m = sb(s_xyz), sb(s_m)
    ident = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1], jnp.float32), (B, 4))
    zero = jnp.zeros((B, 3), jnp.float32)

    # seed a populated batch map
    bgm = bm.BatchGridMap.create(cfg, B)
    for _ in range(3):
        bgm, _, _ = bm.batch_solve_mapping(bgm, cb_xyz, cb_m, sb_xyz, sb_m,
                                           ident, zero, cfg, B)
    fence(bgm)

    # --- flat gather ---
    def gath(carry):
        g, c = carry
        cand_c = bm.batch_grid_gather(g.corner, cb_xyz + c, cfg.corner_cell, B)
        cand_s = bm.batch_grid_gather(g.surf, sb_xyz + c, cfg.surf_cell, B)
        return g, c + cand_c[0, 0, 0] * 0 + cand_s[0, 0, 0] * 0

    chained_carry(f"flat gather B={B}", gath, (bgm, jnp.float32(0)))

    # --- terms + LM (pre-gathered) ---
    cand_c = bm.batch_grid_gather(bgm.corner, cb_xyz, cfg.corner_cell, B)
    cand_s = bm.batch_grid_gather(bgm.surf, sb_xyz, cfg.surf_cell, B)
    x0 = jnp.concatenate([ident, zero], axis=-1)

    def terms(c):
        x = x0.at[:, 4].add(c * 0)
        a, b, de, vc = bm._batch_corner_terms(cb_xyz, cb_m, cand_c, x, cfg)
        nh, nd, vs = bm._batch_surf_terms(sb_xyz, sb_m, cand_s, x, cfg)
        return c + a[0, 0, 0] * 0 + nh[0, 0, 0] * 0

    chained_carry(f"flat terms (1 round) B={B}", terms, jnp.float32(0))

    def lm(c):
        Qc, Qs = cb_xyz.shape[1], sb_xyz.shape[1]
        is_edge = (jnp.arange(Qc + Qs) < Qc)[:, None]
        cp = jnp.concatenate([cb_xyz, sb_xyz], axis=1)
        a, b, de, vc = bm._batch_corner_terms(cb_xyz, cb_m, cand_c, x0, cfg)
        nh, nd, vs = bm._batch_surf_terms(sb_xyz, sb_m, cand_s, x0, cfg)
        A = jnp.concatenate([a, jnp.zeros_like(nh)], axis=1)
        Bp = jnp.concatenate([b, jnp.zeros_like(nh)], axis=1)
        DE = jnp.concatenate([de, jnp.ones((B, Qs), de.dtype)], axis=1)
        NH = jnp.concatenate([jnp.zeros_like(a), nh], axis=1)
        NOOD = jnp.concatenate([jnp.zeros((B, Qc), nd.dtype), nd], axis=1)
        w = jnp.concatenate([vc, vs], axis=1).astype(jnp.float32)
        x = bm._lm_solve_batched(x0.at[:, 4].add(c * 0), cp, A, Bp, DE, NH,
                                 NOOD, is_edge, w, cfg.gn_iterations,
                                 cfg.huber_delta)
        return c + x[0, 0] * 0

    chained_carry(f"flat terms+LM (1 round) B={B}", lm, jnp.float32(0))

    # --- insert ---
    def ins(carry):
        g, c = carry
        corner = bm.batch_grid_insert(g.corner, cb_xyz + c, cb_m,
                                      cfg.corner_cell, cfg.line_resolution, B)
        surf = bm.batch_grid_insert(g.surf, sb_xyz + c, sb_m,
                                    cfg.surf_cell, cfg.plane_resolution, B)
        return bm.BatchGridMap(corner, surf, g.center), c

    chained_carry(f"flat insert c+s B={B}", ins, (bgm, jnp.float32(0)))

    # --- full solve ---
    def solve(carry):
        g, c = carry
        g2, qw, tw = bm.batch_solve_mapping(g, cb_xyz + c, cb_m, sb_xyz + c,
                                            sb_m, ident, zero, cfg, B)
        return g2, c + qw[0, 0] * 0

    chained_carry(f"flat batch_solve_mapping B={B}", solve,
                  (bgm, jnp.float32(0)))

    # --- evict ---
    def ev(carry):
        g, c = carry
        return bm.batch_map_evict(g, zero + c, cfg, B), c

    chained_carry(f"flat batch_map_evict B={B}", ev, (bgm, jnp.float32(0)))

    # --- full batched frame step ---
    st = BatchLoamState.create(full, B)

    def full_step(s):
        feats_b = jax.vmap(lambda r: sr.register_scan_polar(
            r, elev, full.lidar, full.scanreg))(rimg_b)
        s2, _ = batch_frame_step_feats(s, feats_b, full, B)
        return s2

    chained_carry(f"full batched frame B={B}", full_step, st, iters=8)


if __name__ == "__main__":
    main()
