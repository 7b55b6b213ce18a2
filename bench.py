"""Benchmark: full LOAM pipeline throughput on one chip.

Runs scan registration + frame-to-frame odometry + scan-to-map refinement on
KITTI-shaped synthetic HDL-64 frames (~115k points) and reports steady-state
frames/sec. Baseline: the reference C++ stack budgets 100 ms/frame for the
LOAM path (lidar_odometry_mapping.cpp:150-153) and was evaluated at 0.33x
real time, i.e. ~10 frames/sec — vs_baseline is our fps / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time


def main():
    import numpy as np

    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.pipeline import VloamPipeline

    cfg = kitti_hdl64()
    scene = synthetic.urban_scene(0, extent=80.0)
    n_warm, n_meas = 3, 12
    poses = synthetic.drive_trajectory(n_warm + n_meas, speed=1.1,
                                      yaw_rate=0.01)
    frames = [
        synthetic.simulate_scan(scene, T, n_scans=cfg.lidar.n_scans,
                                n_azimuth=1800, noise=0.01, seed=k)
        for k, T in enumerate(poses)
    ]
    sizes = [len(f) for f in frames]

    class _Calib:
        K = np.eye(3)
        P_rect0 = np.hstack([np.eye(3), np.zeros((3, 1))])
        P_velo_to_img = np.hstack([np.eye(3), np.zeros((3, 1))])
        imu_T_velo = np.eye(4)
        imu_T_cam0 = np.eye(4)

    pipe = VloamPipeline(cfg, _Calib())
    # warmup (compile)
    for k in range(n_warm):
        pipe.step(frames[k])
    t0 = time.perf_counter()
    for k in range(n_warm, n_warm + n_meas):
        pipe.step(frames[k])
    dt = time.perf_counter() - t0
    fps = n_meas / dt
    print(json.dumps({
        "metric": "loam_pipeline_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s (scanreg+LO+MO, ~%dk pts/frame)" % (
            int(np.mean(sizes)) // 1000),
        "vs_baseline": round(fps / 10.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
