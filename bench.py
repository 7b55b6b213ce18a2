"""Benchmark: fused device-resident LOAM pipeline throughput on one chip.

Runs the single-jit scanreg + frame-to-frame odometry + scan-to-map step
(vloam_tpu.lidar.loam_step) over KITTI-shaped synthetic HDL-64 frames
(64x1800 rays, ~105k returns each), chunked through lax.scan with all
recurrent state (feature clouds, grid map, poses) device-resident; poses are
downloaded once at the end. Ingest is the quantized polar range image
(uint16, 5 mm: 2 bytes/ray, ~3x fewer host->device bytes than xyz; the
tunnel to the chip moves ~50-130 MB/s, so upload bytes are wall-clock).

Baseline: the reference C++ stack budgets 100 ms/frame for the LOAM path
(lidar_odometry_mapping.cpp:150-153) and was evaluated at 0.33x real time,
i.e. ~10 frames/sec — vs_baseline is our fps / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time


def _enable_compile_cache():
    """Persistent XLA compilation cache: the fused LOAM chunk costs ~2-3 min
    of cold compile on the axon backend; a warm cache makes repeat driver
    runs start in seconds (mirrors tests/conftest.py:25-31)."""
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/vloam_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _bench_combined(cfg, scene, t_budget_s):
    """Secondary metric: full camera+lidar VLOAM throughput (VloamEngine,
    vision chunk + LOAM chunk per 8 frames). Reference full-callback budget
    is ~147 ms/frame = ~6.8 fps (34 ms image + 2.6 ms projection + 11 ms VO
    solve + 100 ms LOAM; src/vloam_main/README.md:115-119,
    lidar_odometry_mapping.cpp:150-153). Returns fps or None if the time
    budget is too tight to attempt it."""
    import time

    import numpy as np

    if t_budget_s < 150:
        return None
    from vloam_tpu.data import synthetic
    from vloam_tpu.runtime.profiling import fence
    from vloam_tpu.vloam_step import VloamEngine

    cfg_c = cfg.replace(detach_VO_LO=False)
    K, P_rect0, cam_T_velo, velo_T_cam = synthetic.default_cam_calib(
        cfg_c.vo.img_width, cfg_c.vo.img_height)

    class C:
        pass

    calib = C()
    calib.K = K
    calib.P_rect0 = P_rect0
    calib.P_velo_to_img = P_rect0 @ np.linalg.inv(velo_T_cam)
    calib.imu_T_velo = np.eye(4)
    calib.imu_T_cam0 = velo_T_cam

    chunk = 8
    n_warm, n_meas = chunk, 5 * chunk  # 40 measured frames: single-chunk
    # tunnel jitter dominated shorter windows (33-47 fps run-to-run)
    poses = synthetic.drive_trajectory(n_warm + n_meas, speed=1.1,
                                       yaw_rate=0.01)
    scans, imgs = [], []
    for k, T in enumerate(poses):
        scans.append(synthetic.simulate_scan_polar(
            scene, T, n_scans=cfg_c.lidar.n_scans, n_azimuth=1800, seed=k))
        imgs.append((synthetic.render_camera(
            scene, T @ velo_T_cam, K, cfg_c.vo.img_width,
            cfg_c.vo.img_height) * 255).astype(np.uint8))
    eng = VloamEngine(cfg_c, calib, chunk=chunk)
    for k in range(n_warm):
        eng.push_polar(scans[k], imgs[k])
    fence(eng.state)
    t0 = time.perf_counter()
    for k in range(n_warm, n_warm + n_meas):
        eng.push_polar(scans[k], imgs[k])
    fence(eng.state)
    return n_meas / (time.perf_counter() - t0)


def main():
    import numpy as np

    _enable_compile_cache()

    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.lidar.loam_step import LoamEngine, unpack_outputs
    from vloam_tpu.runtime.profiling import fence

    cfg = kitti_hdl64()
    t_start = time.perf_counter()
    scene = synthetic.urban_scene(0, extent=80.0)
    chunk = 16
    n_warm, n_meas = chunk, 6 * chunk  # 96 measured frames (~1 s at
    # 90 fps): shorter windows showed 80-91 fps run-to-run tunnel jitter
    poses = synthetic.drive_trajectory(n_warm + n_meas, speed=1.1,
                                      yaw_rate=0.01)
    frames = [
        synthetic.simulate_scan_polar(scene, T, n_scans=cfg.lidar.n_scans,
                                      n_azimuth=1800, noise=0.01, seed=k)
        for k, T in enumerate(poses)
    ]
    n_returns = [int((f > 0).sum()) for f in frames]

    eng = LoamEngine(cfg, chunk=chunk)
    # warmup (compile + first chunk)
    for k in range(n_warm):
        eng.push_polar(frames[k])

    # NOTE: jax.block_until_ready is NOT a real fence on the experimental
    # axon TPU backend (returns while compute is in flight); fence() does a
    # device->host fetch of a tiny state leaf, which genuinely waits.
    fence(eng.state)
    t0 = time.perf_counter()
    for k in range(n_warm, n_warm + n_meas):
        eng.push_polar(frames[k])
    fence(eng.state)
    dt = time.perf_counter() - t0
    outs = unpack_outputs(eng.finish())
    assert np.isfinite(outs["t_w_mo"]).all()
    fps = n_meas / dt

    # secondary metric: full camera+lidar mode, only if time budget allows
    # (the driver's timeout must never kill the primary metric)
    budget_left = 520.0 - (time.perf_counter() - t_start)
    try:
        combined_fps = _bench_combined(cfg, scene, budget_left)
    except Exception:
        combined_fps = None

    rec = {
        "metric": "loam_pipeline_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s (fused scanreg+LO+MO, ~%dk pts/frame)" % (
            int(np.mean(n_returns)) // 1000),
        "vs_baseline": round(fps / 10.0, 3),
    }
    if combined_fps is not None:
        # reference full-callback envelope ~147 ms/frame = ~6.8 fps
        rec["combined_fps"] = round(combined_fps, 3)
        rec["combined_vs_baseline"] = round(combined_fps / 6.8, 3)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
