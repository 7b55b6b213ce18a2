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


def main():
    import numpy as np

    _enable_compile_cache()

    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.lidar.loam_step import LoamEngine, unpack_outputs
    from vloam_tpu.runtime.profiling import fence

    cfg = kitti_hdl64()
    scene = synthetic.urban_scene(0, extent=80.0)
    chunk = 16
    n_warm, n_meas = chunk, 4 * chunk
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
    print(json.dumps({
        "metric": "loam_pipeline_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s (fused scanreg+LO+MO, ~%dk pts/frame)" % (
            int(np.mean(n_returns)) // 1000),
        "vs_baseline": round(fps / 10.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
