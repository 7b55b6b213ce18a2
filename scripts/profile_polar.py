"""Polar-ingest path profile: register_scan_polar sub-stages + full polar
frame step. Run ALONE on the chip (see profile_chained.py for methodology)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr
from vloam_tpu.lidar.loam_step import LoamState, loam_frame_step_feats
from vloam_tpu.runtime.profiling import fence

from profile_chained import chained, chained_carry


def main():
    cfg = kitti_hdl64()
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(3, speed=1.1, yaw_rate=0.01)
    frames = [
        synthetic.simulate_scan_polar(scene, T, n_scans=cfg.lidar.n_scans,
                                      n_azimuth=1800, noise=0.01, seed=k)
        for k, T in enumerate(poses)
    ]
    elev = jnp.asarray(
        np.radians(synthetic.hdl64_elevations(cfg.lidar.n_scans)), jnp.float32)
    r_img = jnp.asarray(frames[1])

    chained("register_scan_polar (full)", lambda e: sr.register_scan_polar(
        r_img, e, cfg.lidar, cfg.scanreg), elev)

    # sub-stages of _features_from_layout on the polar layout
    S, A = r_img.shape
    scale = 0.005

    def front(e):
        r = r_img.astype(jnp.float32) * scale
        valid = r >= cfg.lidar.minimum_range
        az = -jnp.linspace(0.0, 2.0 * jnp.pi, A, endpoint=False)
        ce, se = jnp.cos(e), jnp.sin(e)
        ca, sa = jnp.cos(az), jnp.sin(az)
        xyz = jnp.stack([
            ce[:, None] * ca[None, :],
            ce[:, None] * sa[None, :],
            jnp.broadcast_to(se[:, None], (S, A)),
        ], axis=-1) * r[:, :, None]
        rel = jnp.broadcast_to((jnp.arange(A) / A)[None, :], (S, A))
        col = jnp.broadcast_to(jnp.arange(A, dtype=jnp.int32)[None, :], (S, A))
        key = jnp.where(valid, col, A)
        _, x_s, y_s, z_s, rel_s, v_s = jax.lax.sort(
            (key, xyz[..., 0], xyz[..., 1], xyz[..., 2], rel,
             valid.astype(jnp.int32)), num_keys=1, dimension=1)
        ok = v_s > 0
        pts = jnp.where(ok[:, :, None],
                        jnp.stack([x_s, y_s, z_s], axis=-1), 0.0)
        rt = jnp.where(ok, rel_s, 0.0)
        counts = jnp.sum(valid, axis=1).astype(jnp.int32)
        return pts, rt, counts

    chained("  decode+compact front", front, elev)
    pts, rt, counts = jax.jit(front)(elev)
    fence(pts)

    chained("  curvature", lambda p: sr._curvature(p), pts)
    curv = jax.jit(sr._curvature)(pts)

    chained("  select (vmapped rings)", lambda p, c: jax.vmap(
        lambda pp, cc, kk: sr._select_ring(pp, cc, kk, cfg.scanreg))(
            p, c, counts)[0].astype(jnp.float32), pts, curv)

    chained("  features_from_layout (all)",
            lambda p, r2: sr._features_from_layout(p, r2, counts, cfg.scanreg),
            pts, rt)

    feats = jax.jit(lambda: sr.register_scan_polar(
        r_img, elev, cfg.lidar, cfg.scanreg))()
    fence(feats)

    st = LoamState.create(cfg)

    def full_step(s):
        f2 = sr.register_scan_polar(r_img, elev, cfg.lidar, cfg.scanreg)
        q = jnp.asarray([0, 0, 0, 1.0], jnp.float32)
        t = jnp.zeros(3, jnp.float32)
        s2, _ = loam_frame_step_feats(s, f2, q, t, jnp.asarray(False), cfg)
        return s2

    chained_carry("polar loam_frame_step (full)", full_step, st, iters=32)


if __name__ == "__main__":
    main()
