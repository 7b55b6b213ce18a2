"""Long-drive evaluation on the synthetic world (the data-free stand-in for
the KITTI parity runs): drives N frames through the fused engines in both
reference modes, reports KITTI-style metrics + throughput, writes golden
trajectories for regression, and updates RESULTS.md."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.eval.kitti_metrics import kitti_metrics
from vloam_tpu.pipeline import run_sequence_fused


CACHE = Path("/tmp/vloam_synth_cache")


def build_frames(n_frames, with_cam, cfg, with_polar=False):
    scene = synthetic.urban_scene(0, extent=160.0, n_boxes=36, n_poles=48,
                                  scatter=24)
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
    # S-curve staying on the street (real drives follow roads); both turn
    # directions exercised, |heading| <= ~0.15 rad
    k = np.arange(n_frames)
    yaw = np.where(k < n_frames // 4, 0.006,
                   np.where(k < 3 * n_frames // 4, -0.006, 0.006))
    poses = synthetic.drive_trajectory(n_frames, speed=1.2, yaw_rate=yaw)
    CACHE.mkdir(exist_ok=True)
    frames = []
    t0 = time.time()
    # cache key MUST change whenever the scene or trajectory params above
    # change, or stale frames get scored against the new ground truth
    world_tag = "w3_ext160_b36_s24_scurve"
    for k, T in enumerate(poses):
        tag = f"{world_tag}_f{k}_{int(with_cam)}_{cfg.vo.img_width}"
        cpath = CACHE / f"{tag}.npz"
        if cpath.exists():
            data = dict(np.load(cpath))
            f = {"points": data["points"]}
            if with_cam:
                f["image"] = data["image"]
        else:
            data = {"points": synthetic.simulate_scan(scene, T, n_scans=64,
                                                      n_azimuth=1800,
                                                      noise=0.01, seed=k)}
            if with_cam:
                data["image"] = synthetic.render_camera(
                    scene, T @ velo_T_cam, K, cfg.vo.img_width,
                    cfg.vo.img_height)
            np.savez(cpath, **data)
            f = dict(data)
        if with_polar:
            # polar (range-image) twin of the same pose: the production
            # smallest-upload ingest; cached alongside, generated lazily
            if "polar" not in data:
                data["polar"] = synthetic.simulate_scan_polar(
                    scene, T, n_scans=64, n_azimuth=1800, noise=0.01,
                    seed=k)
                np.savez(cpath, **data)
            f["polar"] = data["polar"]
            f.pop("points", None)  # run_sequence_fused prefers 'polar'
        frames.append(f)
        if k % 10 == 0:
            print(f"frame {k} gen t={time.time()-t0:.0f}s", flush=True)
    print(f"frame gen: {time.time()-t0:.1f}s", flush=True)
    T0 = poses[0] @ velo_T_cam
    gt = np.stack([(np.linalg.inv(T0) @ (T @ velo_T_cam))[:3, :]
                   for T in poses])
    return calib, frames, gt


def _enable_compile_cache():
    import os

    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/vloam_jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(n_frames=100):
    _enable_compile_cache()
    results = {}
    golden_dir = Path(__file__).resolve().parents[1] / "tests" / "golden"
    golden_dir.mkdir(exist_ok=True)

    # ---- lidar-only (LOAM path) ----
    cfg = kitti_hdl64()
    calib, frames, gt = build_frames(n_frames, with_cam=False, cfg=cfg)
    t0 = time.time()
    res = run_sequence_fused(cfg, calib, iter(frames), lidar_only=True,
                             chunk=10)
    wall = time.time() - t0
    for which in ("LO", "MO"):
        m = kitti_metrics(gt, res[which], step=1)
        results[f"lidar_only/{which}"] = m
        print(which, json.dumps(m))
    # steady-state fps: second run, compile already cached in-process
    res2 = run_sequence_fused(cfg, calib, iter(frames), lidar_only=True,
                              chunk=10)
    print(f"lidar-only: first-run {res['fps']:.1f} fps (wall {wall:.1f}s "
          f"incl. compile), steady {res2['fps']:.1f} fps")
    results["lidar_only/fps"] = res2["fps"]
    np.save(golden_dir / "synthetic_lidar_MO.npy", res["MO"])
    np.save(golden_dir / "synthetic_gt.npy", gt)

    # ---- full VLOAM combined ----
    cfg_c = kitti_hdl64().replace(detach_VO_LO=False)
    calib, frames, gt = build_frames(n_frames, with_cam=True, cfg=cfg_c)
    t0 = time.time()
    res_c = run_sequence_fused(cfg_c, calib, iter(frames), chunk=10)
    wall = time.time() - t0
    for which in ("VO", "LO", "MO"):
        m = kitti_metrics(gt, res_c[which], step=1)
        results[f"combined/{which}"] = m
        print("combined", which, json.dumps(m))
    res_c2 = run_sequence_fused(cfg_c, calib, iter(frames), chunk=10)
    print(f"combined: first-run {res_c['fps']:.1f} fps (wall {wall:.1f}s "
          f"incl. compile), steady {res_c2['fps']:.1f} fps")
    results["combined/fps"] = res_c2["fps"]

    # ---- polar (range-image) ingest: the production smallest-upload
    # path, accuracy + end-to-end fps rows next to the xyz-ingest ones ----
    cfg = kitti_hdl64()
    calib, frames, gt = build_frames(n_frames, with_cam=False, cfg=cfg,
                                     with_polar=True)
    res_p = run_sequence_fused(cfg, calib, iter(frames), lidar_only=True,
                               chunk=10)
    res_p2 = run_sequence_fused(cfg, calib, iter(frames), lidar_only=True,
                                chunk=10)
    m = kitti_metrics(gt, res_p["MO"], step=1)
    results["lidar_only_polar/MO"] = m
    results["lidar_only_polar/fps"] = res_p2["fps"]
    print("polar MO", json.dumps(m), f"steady {res_p2['fps']:.1f} fps")

    cfg_c = kitti_hdl64().replace(detach_VO_LO=False)
    calib, frames, gt = build_frames(n_frames, with_cam=True, cfg=cfg_c,
                                     with_polar=True)
    res_cp = run_sequence_fused(cfg_c, calib, iter(frames), chunk=10)
    res_cp2 = run_sequence_fused(cfg_c, calib, iter(frames), chunk=10)
    for which in ("VO", "MO"):
        m = kitti_metrics(gt, res_cp[which], step=1)
        results[f"combined_polar/{which}"] = m
        print("combined polar", which, json.dumps(m))
    results["combined_polar/fps"] = res_cp2["fps"]
    print(f"combined polar steady {res_cp2['fps']:.1f} fps")

    out = Path(__file__).resolve().parents[1] / "RESULTS.md"
    head = ["# Synthetic-drive evaluation (no KITTI data in this env)\n\n"]
    head.append(f"{n_frames} frames, HDL-64 profile (~110k pts/frame), "
                "synthetic urban world with exact ground truth; metrics are "
                "KITTI-devkit style (translational %, rotational deg/m over "
                "100-800 m subsequences) plus ATE.\n\n")
    head.append("| run | t_rel % | r deg/m | ATE rmse m | "
                "fps (steady, chip) |\n")
    head.append("|-----|---------|---------|------------|-----|\n")
    for key, m in results.items():
        if key.endswith("fps"):
            continue
        fps = results.get(key.split("/")[0] + "/fps", 0)
        head.append(f"| {key} | {m['t_rel_percent']:.3f} | "
                    f"{m['r_deg_per_m']:.4f} | {m['ate_rmse_m']:.3f} | "
                    f"{fps:.1f} |\n")
    head.append("\nfps = end-to-end second run on the single real TPU chip "
                "(engine re-created, compile cached): includes host staging, "
                "upload, device compute, download, f64 export. The headline "
                "steady-state device rate is bench.py's (see BENCH_r*.json); "
                "first-run numbers incl. compile are printed in the eval "
                "log.\n")
    # PRESERVE every other section: this script owns only the text before
    # the first "## " heading. A whole-file overwrite here is exactly how
    # round 3 silently lost the loop-closure / long-drive / batch tables
    # (VERDICT r3 weak 1).
    tail = ""
    if out.exists():
        old = out.read_text()
        idx = old.find("\n## ")
        if idx >= 0:
            tail = old[idx:]
    out.write_text("".join(head) + tail)
    print("wrote", out, "(preserved", tail.count("\n## "), "sections)")
    json.dump(results, open(golden_dir / "synthetic_metrics.json", "w"),
              indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
