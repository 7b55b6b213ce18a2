import os
import sys
import tempfile

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    q, t = jax.jit(fn)(*args)
    q, t = np.asarray(q), np.asarray(t)
    assert np.isfinite(q).all() and np.isfinite(t).all()
    assert abs(np.linalg.norm(q) - 1.0) < 1e-3


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_native_io_roundtrip():
    from vloam_tpu.runtime.native_io import PrefetchLoader, load_bin_native

    d = tempfile.mkdtemp()
    paths = []
    rng = np.random.default_rng(0)
    for k in range(4):
        pts = rng.random((500 + 100 * k, 4)).astype(np.float32)
        p = os.path.join(d, f"{k:06d}.bin")
        pts.tofile(p)
        paths.append(p)
    x = load_bin_native(paths[1])
    want = np.fromfile(paths[1], np.float32).reshape(-1, 4)[:, :3]
    np.testing.assert_allclose(x, want)
    ld = PrefetchLoader(paths, max_pts=1024, n_threads=2)
    seen = 0
    for k, (arr, cnt) in enumerate(ld):
        want = np.fromfile(paths[k], np.float32).reshape(-1, 4)
        assert cnt == len(want)
        np.testing.assert_allclose(arr[:cnt], want[:, :3])
        seen += 1
    assert seen == 4


def test_kitti_io_roundtrip(tmp_path):
    from vloam_tpu.data.kitti import (KittiOdometrySequence,
                                      load_velodyne_bin)

    seq_dir = tmp_path / "sequences" / "00"
    (seq_dir / "velodyne").mkdir(parents=True)
    rng = np.random.default_rng(1)
    pts = rng.random((1000, 4)).astype(np.float32)
    pts.tofile(seq_dir / "velodyne" / "000000.bin")
    with open(seq_dir / "calib.txt", "w") as f:
        P = "7.188560e+02 0 6.071928e+02 0 0 7.188560e+02 1.852157e+02 0 0 0 1 0"
        f.write(f"P0: {P}\nP1: {P}\nP2: {P}\nP3: {P}\n")
        f.write("Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    ds = KittiOdometrySequence(str(tmp_path), "00")
    assert len(ds) == 1
    frame = ds.frame(0)
    np.testing.assert_allclose(frame["points"], pts[:, :3])
    assert ds.calib.K[0, 0] == pytest.approx(718.856)


def test_cli_synthetic_run(tmp_path, capsys):
    from vloam_tpu.cli import main

    # tiny run: 3 frames, lidar-only to keep it quick
    rc = main(["run", "--synthetic", "3", "--mode", "lidar-only",
               "--out", str(tmp_path), "--verbose", "0"])
    assert rc == 0
    assert (tmp_path / "MO1.txt").exists()
    out = capsys.readouterr().out
    # fused engine prints throughput; host engine prints the stage timing
    assert ("throughput" in out) or ("timing summary" in out)
    assert "MO" in out


def test_native_polar_projection_roundtrip(tmp_path):
    """Native bin->range-image projection must agree with the device decode:
    project synthetic points, decode on device, ranges must match to the
    5 mm quantum and ring/azimuth assignment to the reference formulas."""
    import numpy as np
    from vloam_tpu.data import synthetic
    from vloam_tpu.runtime.native_io import (PolarPrefetchLoader,
                                             project_polar_native)

    # synthesize points exactly on the decode ray grid
    elev = np.radians(synthetic.hdl64_elevations(64))
    n_az = 360
    az = -np.linspace(0, 2 * np.pi, n_az, endpoint=False)
    rng = np.random.default_rng(3)
    # sample unique (ring, col) bins: collisions legitimately keep only the
    # nearer return, which is not what this roundtrip asserts
    bins = rng.choice(50 * n_az, 500, replace=False)
    rings, cols = bins // n_az, bins % n_az
    ranges = rng.uniform(6.0, 80.0, 500).astype(np.float32)
    d = np.stack([np.cos(elev[rings]) * np.cos(az[cols]),
                  np.cos(elev[rings]) * np.sin(az[cols]),
                  np.sin(elev[rings])], 1)
    pts = (d * ranges[:, None]).astype(np.float32)
    rec = np.concatenate([pts, np.zeros((500, 1), np.float32)], 1)
    f = tmp_path / "000000.bin"
    rec.astype(np.float32).tofile(f)

    img = project_polar_native(str(f), 64, n_az, 0.005, 5.0)
    got = img[rings, cols].astype(np.float64) * 0.005
    # ring formulas snap elevations to beam centers; ranges must roundtrip
    hit = got > 0
    assert hit.mean() > 0.95  # collisions/edge rings may drop a few
    np.testing.assert_allclose(got[hit], ranges[hit], atol=0.006)

    # prefetch loader emits the same image
    ld = PolarPrefetchLoader([str(f)], 64, n_az, 0.005, 5.0)
    img2, cnt = next(ld)
    assert cnt > 450
    np.testing.assert_array_equal(img2, img)
    ld.close()
