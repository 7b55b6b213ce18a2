"""Seq-01 stress eval: the feature-poor highway regime.

KITTI seq 01 is the reference's hardest documented failure (BASELINE.md
row 01 / reference figures/evaluation.png: VO 50.5% t_rel; coupling that
VO into LO drags MO(C) to 45.4% while MO(D) stays at 2.7% — the entire
reason detach_VO_LO exists, vloam_main.launch:4). This drives the
synthetic analogue (data/synthetic.highway_scene: near-featureless
images, sparse guardrail + distant-structure geometry, highway speed)
through three configurations:

  detached              — MO(D): LO/MO never see the VO,
  combined (guards on)  — default min_vo_matches gate: bad VO frames are
                          rejected and LO falls back to its own f2f seed,
  combined (guards off) — min_vo_matches=0: the reference's failure mode,
                          garbage VO seeds poison LO -> MO.

Appends the table to RESULTS.md.
"""

import dataclasses
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
SPEED = 3.2  # ~highway inter-frame motion (eval_synthetic drives 1.2)


def build_frames(n_frames, cfg):
    scene = synthetic.highway_scene(0)
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
    poses = synthetic.drive_trajectory(n_frames, speed=SPEED,
                                       yaw_rate=0.0015)
    CACHE.mkdir(exist_ok=True)
    frames = []
    t0 = time.time()
    world_tag = "hw1_ext260_t006"
    for k, T in enumerate(poses):
        cpath = CACHE / f"{world_tag}_f{k}_{cfg.vo.img_width}.npz"
        if cpath.exists():
            data = np.load(cpath)
            f = {"points": data["points"], "image": data["image"]}
        else:
            f = {"points": synthetic.simulate_scan(scene, T, n_scans=64,
                                                   n_azimuth=1800,
                                                   noise=0.01, seed=k),
                 "image": synthetic.render_camera(scene, T @ velo_T_cam, K,
                                                  cfg.vo.img_width,
                                                  cfg.vo.img_height)}
            np.savez(cpath, **f)
        frames.append(f)
    print(f"frame gen: {time.time()-t0:.1f}s", flush=True)
    T0 = poses[0] @ velo_T_cam
    gt = np.stack([(np.linalg.inv(T0) @ (T @ velo_T_cam))[:3, :]
                   for T in poses])
    return calib, frames, gt


def _cache():
    import os

    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/vloam_jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(n_frames=80):
    _cache()
    base = kitti_hdl64()
    calib, frames, gt = build_frames(n_frames, base)
    rows = []

    configs = [
        ("detached", base.replace(detach_VO_LO=True), ("LO", "MO")),
        ("combined (guards on)", base.replace(detach_VO_LO=False),
         ("VO", "LO", "MO")),
        ("combined (guards OFF)",
         base.replace(detach_VO_LO=False,
                      vo=dataclasses.replace(base.vo, min_vo_matches=0)),
         ("VO", "LO", "MO")),
        # degrade-don't-die: LK-flow re-match + seed dead-reckoning when
        # descriptor matching collapses; the gate still protects LO/MO
        ("combined (guards on + lowtex fallback)",
         base.replace(detach_VO_LO=False,
                      vo=dataclasses.replace(base.vo, lowtex_fallback=True)),
         ("VO", "LO", "MO")),
    ]
    for name, cfg, streams in configs:
        res = run_sequence_fused(cfg, calib, iter(frames),
                                 lidar_only=False, chunk=10)
        raw = res["raw"]
        n_match = raw["n32"] + raw["n22"]
        gated = int(np.sum((n_match[1:] < base.vo.min_vo_matches)))
        row = {"name": name,
               "mean_matches": float(np.mean(n_match[1:])),
               "vo_gate_fired": gated}
        for which in streams:
            m = kitti_metrics(gt, res[which], step=1)
            row[which] = m
            print(name, which, json.dumps(m), flush=True)
        print(f"{name}: mean matches {row['mean_matches']:.0f}, "
              f"frames under min_vo_matches gate: {gated}/{n_frames - 1}",
              flush=True)
        rows.append(row)

    out = Path(__file__).resolve().parents[1] / "RESULTS.md"
    lines = [
        "",
        "## Seq-01 stress: feature-poor highway (synthetic)",
        "",
        f"{n_frames} frames at speed {SPEED} (~{SPEED*n_frames:.0f} m) on "
        "`synthetic.highway_scene` — near-featureless images + sparse "
        "geometry, the KITTI seq-01 regime (reference TABLE I row 01: VO "
        "50.5% t_rel, MO(C) 45.4% vs MO(D) 2.7%).",
        "",
        "| config | mean VO matches | gate fired | VO t_rel% | VO ATE m | "
        "MO t_rel% | MO ATE m |",
        "|---|---|---|---|---|---|---|",
    ]
    for row in rows:
        vo = row.get("VO")
        mo = row["MO"]

        def fmt(m, k):
            if m is None:
                return "—"
            v = m[k]
            return f"{v:.2f}" if np.isfinite(v) else "nan"

        lines.append(
            f"| {row['name']} | {row['mean_matches']:.0f} | "
            f"{row['vo_gate_fired']} | {fmt(vo, 't_rel_percent')} | "
            f"{fmt(vo, 'ate_rmse_m')} | {fmt(mo, 't_rel_percent')} | "
            f"{fmt(mo, 'ate_rmse_m')} |")
    lines += [
        "",
        "With guards on, the min_vo_matches gate rejects every low-match "
        "solve so LO/MO never consume the VO and stay healthy (the "
        "reference's own VO row on seq 01 is 50.5%). With the gate "
        "disabled, the garbage VO seeds poison LO and MO exactly as the "
        "reference's coupled mode does. The lowtex-fallback row degrades "
        "instead of dying: gated frames are re-matched by LK flow and, "
        "failing that, dead-reckoned from the LO-derived seed "
        "(vo.lowtex_fallback), producing a finite usable-but-degraded VO "
        "stream like the reference emits on seq 01 — while the gate still "
        "keeps it out of the LO prior (MO must match the guards-on row).",
        "",
    ]
    with open(out, "a") as f:
        f.write("\n".join(lines))
    print(f"appended highway table to {out}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 80)
