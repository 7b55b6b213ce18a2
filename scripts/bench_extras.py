"""Secondary benchmarks: full VLOAM (camera+lidar) throughput and pose-graph
BA iteration rate (the BASELINE.json 'BA iters/sec' metric). Results go into
RESULTS.md; the primary driver metric stays in bench.py."""

import sys, time, json
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np


def _cache():
    import os, jax
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/vloam_jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bench_vloam(n_chunks=4, chunk=8):
    import jax
    _cache()
    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.vloam_step import VloamEngine

    cfg = kitti_hdl64().replace(detach_VO_LO=False)
    scene = synthetic.urban_scene(0, extent=80.0)
    K, P_rect0, cam_T_velo, velo_T_cam = synthetic.default_cam_calib(
        cfg.vo.img_width, cfg.vo.img_height)

    class C:
        pass

    calib = C()
    calib.K = K
    calib.P_rect0 = P_rect0
    calib.P_velo_to_img = P_rect0 @ np.linalg.inv(velo_T_cam)
    calib.imu_T_velo = np.eye(4)
    calib.imu_T_cam0 = velo_T_cam
    n = chunk * (n_chunks + 1)
    poses = synthetic.drive_trajectory(n, speed=1.1, yaw_rate=0.01)
    cache = Path("/tmp/vloam_bench_cam_cache.npz")
    if cache.exists():
        data = np.load(cache)
        scans = [data[f"s{k}"] for k in range(n)]
        imgs = [data[f"i{k}"] for k in range(n)]
    else:
        scans, imgs = [], []
        for k, T in enumerate(poses):
            scans.append(synthetic.simulate_scan(scene, T, n_scans=64,
                                                 n_azimuth=1800, seed=k))
            imgs.append((synthetic.render_camera(scene, T @ velo_T_cam, K,
                                                 cfg.vo.img_width,
                                                 cfg.vo.img_height)
                         * 255).astype(np.uint8))
        np.savez(cache, **{f"s{k}": s for k, s in enumerate(scans)},
                 **{f"i{k}": i for k, i in enumerate(imgs)})
    from vloam_tpu.runtime.profiling import fence

    eng = VloamEngine(cfg, calib, chunk=chunk)
    for k in range(chunk):
        eng.push(scans[k], imgs[k])
    fence(eng.state)  # block_until_ready is a no-op on the axon backend
    t0 = time.perf_counter()
    for k in range(chunk, n):
        eng.push(scans[k], imgs[k])
    fence(eng.state)
    fps = (n - chunk) / (time.perf_counter() - t0)
    print(json.dumps({"metric": "vloam_full_frames_per_sec",
                      "value": round(fps, 1)}))
    return fps


def bench_pgo(n_poses=256, n_iters=10):
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as R
    from vloam_tpu.parallel.pose_graph import build_odometry_graph, \
        optimize_pose_graph

    rng = np.random.default_rng(0)
    poses = []
    for k in range(n_poses):
        q = R.from_euler("z", 0.002 * k).as_quat()
        poses.append(np.concatenate([q, [0.5 * k, 0.001 * k * k, 0]]))
    g = build_odometry_graph(np.stack(poses),
                             loop_pairs=[(n_poses - 1, 0)])
    out = optimize_pose_graph(g, gn_iters=n_iters, cg_iters=32)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = optimize_pose_graph(g, gn_iters=n_iters, cg_iters=32)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    # one "BA iteration" = one GN step (linearize ~n_poses edges + 32 PCG)
    print(json.dumps({
        "metric": "pose_graph_gn_iters_per_sec",
        "value": round(n_iters / dt, 1),
        "n_poses": n_poses,
    }))
    return n_iters / dt


def bench_batch(batch=4, n_chunks=3, chunk=8, pack=False):
    """Aggregate throughput of BatchLoamEngine: B independent HDL-64
    sequences advanced concurrently on one chip (vmap over streams inside
    the frame scan). pack=True stages 12-bit packed range images at 3 cm
    quantization (loam_step.pack12) — the B-way batch multiplies upload
    bytes, which bound wall clock on the tunnel transport, so the packed
    run is the production-throughput configuration; pack=False keeps the
    uint16/5 mm run comparable with earlier rounds."""
    import numpy as np
    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.lidar.loam_step import BatchLoamEngine
    from vloam_tpu.runtime.profiling import fence

    _cache()
    cfg = kitti_hdl64()
    n = chunk * (n_chunks + 1)
    scale = 0.03 if pack else 0.005
    streams = []
    for b in range(batch):
        scene = synthetic.urban_scene(b, extent=80.0)
        poses = synthetic.drive_trajectory(n, speed=1.1,
                                           yaw_rate=0.01 + 0.002 * b)
        scans = [
            synthetic.simulate_scan_polar(scene, T, n_scans=64,
                                          n_azimuth=1800, seed=b * 1000 + k,
                                          range_scale=scale)
            for k, T in enumerate(poses)
        ]
        if pack:
            scans = [np.minimum(s, 4095).astype(np.uint16) for s in scans]
        streams.append(scans)
    # quantize_mm=5.0: the batch path is upload-bound on the tunnel
    # backend; explicit here because the engine default flipped to
    # lossless 0.0 in round 4 (advisor r4: keep this bench comparable
    # across rounds)
    eng = BatchLoamEngine(cfg, batch=batch, chunk=chunk, quantize_mm=5.0,
                          pack12=pack)
    for k in range(chunk):
        for b in range(batch):
            eng.push_polar(b, streams[b][k], range_scale=scale)
    fence(eng.states)
    import time

    t0 = time.perf_counter()
    for k in range(chunk, n):
        for b in range(batch):
            eng.push_polar(b, streams[b][k], range_scale=scale)
    fence(eng.states)
    dt = time.perf_counter() - t0
    agg = batch * (n - chunk) / dt
    print(json.dumps({"metric": "batch_loam_aggregate_frames_per_sec",
                      "value": round(agg, 1), "batch": batch,
                      "pack12": pack}))
    return agg


if __name__ == "__main__":
    bench_pgo()
    bench_vloam()
    bench_batch()
    bench_batch(pack=True)
