import numpy as np

from vloam_tpu.pipeline import run_sequence
from vloam_tpu.vloam_step import VloamEngine, unpack_vloam_outputs
from vloam_tpu.eval.kitti_metrics import kitti_metrics

from test_pipeline import small_cfg, synth_setup


def test_vloam_engine_matches_host_pipeline(tmp_path):
    n = 4
    calib, frames, gt = synth_setup(n, seed=2)
    cfg = small_cfg(detach_VO_LO=False)

    host = run_sequence(cfg, calib, frames(), out_dir=str(tmp_path))

    eng = VloamEngine(cfg, calib, chunk=2)
    for f in frames():
        eng.push(f["points"], f["image"])
    res = unpack_vloam_outputs(eng.finish(), calib)

    # LO/MO are deterministic vs the host path; VO sees uint8-quantized
    # images in the engine, so it is compared against ground truth below
    # rather than bit-for-bit against the host run.
    for which, tol in (("LO", 0.05), ("MO", 0.05)):
        d = np.linalg.norm(
            res[f"traj_{which}"][:, :, 3] - host[which][:, :, 3], axis=1)
        assert d.max() < tol, (which, d)
    m_vo = kitti_metrics(gt, res["traj_VO"], step=1)
    assert m_vo["ate_rmse_m"] < 1.0, m_vo

    # and against ground truth
    for which, tol in (("LO", 0.35), ("MO", 0.35)):
        m = kitti_metrics(gt, res[f"traj_{which}"], step=1)
        assert m["ate_rmse_m"] < tol, (which, m)


def test_vloam_engine_polar_ingest():
    """push_polar (range-image upload, on-device decode for both depth
    grid and LOAM) tracks ground truth like the xyz path."""
    from vloam_tpu.data import synthetic

    n = 4
    cfg = small_cfg(detach_VO_LO=False)
    scene = synthetic.urban_scene(2)
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
    poses = synthetic.drive_trajectory(n, speed=1.0, yaw_rate=0.015)
    T0 = poses[0] @ velo_T_cam
    gt = np.stack([(np.linalg.inv(T0) @ (T @ velo_T_cam))[:3, :]
                   for T in poses])

    eng = VloamEngine(cfg, calib, chunk=2)
    for k, T in enumerate(poses):
        polar = synthetic.simulate_scan_polar(scene, T, n_scans=64,
                                              n_azimuth=900, seed=k)
        img = synthetic.render_camera(scene, T @ velo_T_cam, K,
                                      cfg.vo.img_width, cfg.vo.img_height)
        eng.push_polar(polar, img)
    res = unpack_vloam_outputs(eng.finish(), calib)
    for which, tol in (("LO", 0.35), ("MO", 0.35)):
        m = kitti_metrics(gt, res[f"traj_{which}"], step=1)
        assert m["ate_rmse_m"] < tol, (which, m)
    assert res["n32"][1:].min() > 0  # VO got depth-backed matches


def test_engine_accepts_off_size_images():
    """KITTI image sizes vary per sequence (1241x376, 1226x370, ...); the
    jitted vision path needs the config's static shape, so the engine
    crops/zero-pads bottom-right (pixel coords and K stay valid)."""
    import numpy as np

    from vloam_tpu.data import synthetic
    from vloam_tpu.vloam_step import _fit_image

    cfg = small_cfg(detach_VO_LO=False)
    vo = cfg.vo
    for shape in ((vo.img_height + 1, vo.img_width - 1),
                  (vo.img_height - 2, vo.img_width + 3)):
        img = np.ones(shape, np.uint8)
        out = _fit_image(img, vo)
        assert out.shape == (vo.img_height, vo.img_width)

    calib, frames, gt = synth_setup(3, seed=4)
    eng = VloamEngine(cfg, calib, chunk=2)
    for f in frames():
        img = f["image"][: vo.img_height - 2, : vo.img_width - 3]  # off-size
        eng.push(f["points"], img)
    res = unpack_vloam_outputs(eng.finish(), calib)
    assert np.isfinite(res["traj_MO"]).all()


def test_vloam_engine_long_combined_drive_matches_host():
    """Long-drive coupling check (VERDICT r3 weak 6): the chunked engine
    must reproduce the host pipeline's per-frame VO<->LO coupling
    (reference visual_odometry.cpp:269-281 seeds VO from the last LO f2f;
    laser_odometry.cpp:223-236 seeds LO from the same-frame VO). The
    round-3 engine approximated the VO seed intra-chunk and diverged by
    1.77 m LO ATE on this drive; the vision+LO-interleaved program 1
    (vloam_step.vision_lo_run_chunk) restores the exact chain."""
    n = 24
    calib, frames, gt = synth_setup(n, seed=6)
    cfg = small_cfg(detach_VO_LO=False)

    def u8_frames():
        # feed BOTH paths identical uint8 images (KITTI images are uint8;
        # the engine quantizes internally, and in the low-match regime a
        # quantization-shifted match set shifts the marginal VO solve)
        for f in frames():
            img = np.clip(f["image"] * 255.0, 0, 255).astype(np.uint8)
            yield {"points": f["points"],
                   "image": img.astype(np.float32) / 255.0}

    host = run_sequence(cfg, calib, u8_frames())
    eng = VloamEngine(cfg, calib, chunk=8)
    for f in u8_frames():
        eng.push(f["points"], f["image"])
    res = unpack_vloam_outputs(eng.finish(), calib)

    path_len = np.linalg.norm(np.diff(gt[:, :, 3], axis=0), axis=1).sum()
    assert path_len > 15.0  # long enough for seed drift to compound
    # tolerance: this world is deliberately match-poor (~20-30 matches);
    # compiled-program float-order differences can flip a marginal match
    # and shift one VO solve by a few cm (the round-3 engine's VO-on-VO
    # seeding diverged by 1.77 m here — that's what the bound guards)
    for which, tol in (("LO", 0.15), ("MO", 0.15)):
        d = np.linalg.norm(
            res[f"traj_{which}"][:, :, 3] - host[which][:, :, 3], axis=1)
        assert d.max() < tol, (which, float(d.max()))
    # the engine's VO itself stays healthy over the whole drive
    m_vo = kitti_metrics(gt, res["traj_VO"], step=1)
    m_vo_host = kitti_metrics(gt, host["VO"], step=1)
    assert m_vo["ate_rmse_m"] < max(2.0 * m_vo_host["ate_rmse_m"], 0.3), (
        m_vo, m_vo_host)


def test_polar_fov_slice_preserves_depth_grid():
    """The forward-sector azimuth slice (cfg.vo.polar_fov_fraction) feeds
    the depth grid only rays that can project into the camera; the
    resulting grid must EQUAL the full-sweep grid (rays outside the FOV
    contribute nothing after the projection bounds check)."""
    import jax.numpy as jnp

    from vloam_tpu.data import synthetic
    from vloam_tpu.lidar.loam_step import polar_to_xyz, polar_to_xyz_cols
    from vloam_tpu.vision.depth_map import build_depth_grid

    cfg = small_cfg()
    scene = synthetic.urban_scene(2)
    K, P_rect0, cam_T_velo, velo_T_cam = synthetic.default_cam_calib(
        cfg.vo.img_width, cfg.vo.img_height)
    P = jnp.asarray(P_rect0 @ np.linalg.inv(velo_T_cam), jnp.float32)
    T = synthetic.drive_trajectory(2)[1]
    r_img = synthetic.simulate_scan_polar(scene, T, n_scans=64,
                                          n_azimuth=900, seed=3)
    elev = jnp.asarray(np.radians(synthetic.hdl64_elevations(64)),
                       jnp.float32)
    S, A = r_img.shape
    full = polar_to_xyz(jnp.asarray(r_img), elev, 0.005)
    g_full = build_depth_grid(full, jnp.ones(len(full), bool), P, cfg.vo)

    frac = cfg.vo.polar_fov_fraction
    half = max(1, int(round(A * frac / 2.0)))
    az_full = -jnp.arange(A, dtype=jnp.float32) * (2.0 * jnp.pi / A)
    cols = jnp.concatenate([jnp.arange(half), jnp.arange(A - half, A)])
    r_sel = jnp.concatenate(
        [jnp.asarray(r_img)[:, :half], jnp.asarray(r_img)[:, A - half:]],
        axis=1)
    sel = polar_to_xyz_cols(r_sel, elev, az_full[cols], 0.005)
    g_sel = build_depth_grid(sel, jnp.ones(len(sel), bool), P, cfg.vo)

    assert int(g_full.cnt.sum()) > 100  # non-vacuous
    np.testing.assert_array_equal(np.asarray(g_full.cnt),
                                  np.asarray(g_sel.cnt))
    np.testing.assert_allclose(np.asarray(g_full.z), np.asarray(g_sel.z),
                               atol=1e-5)


def test_lowtex_fallback_degrades_instead_of_dying():
    """vo.lowtex_fallback: with constant (zero-texture) images no keypoints
    survive, so both descriptor matching AND the flow re-match produce
    nothing; the fallback exports the LO-derived seed so the VO stream
    dead-reckons a finite, moving trajectory — while LO/MO stay identical
    to the plain gated run (the fallback must never touch the LO prior)."""
    import dataclasses

    from test_pipeline import synth_setup

    n = 4
    calib, frames, gt = synth_setup(n, seed=5)

    def noisy_frames():
        for f in frames():
            yield {"points": f["points"],
                   "image": np.full(f["image"].shape, 0.5)}

    base = small_cfg(detach_VO_LO=False)
    results = {}
    for name, cfg in (
        ("off", base),
        ("on", base.replace(vo=dataclasses.replace(base.vo,
                                                   lowtex_fallback=True))),
    ):
        eng = VloamEngine(cfg, calib, chunk=2)
        for f in noisy_frames():
            eng.push(f["points"], f["image"])
        results[name] = unpack_vloam_outputs(eng.finish(), calib)

    for name, res in results.items():
        n_match = res["n32"] + res["n22"]
        assert (n_match < base.vo.min_vo_matches).all(), (name, n_match)

    # LO/MO unaffected by the fallback (gate still protects the prior)
    for which in ("LO", "MO"):
        np.testing.assert_allclose(
            results["on"][f"traj_{which}"], results["off"][f"traj_{which}"],
            atol=1e-5)

    # without fallback the VO stream freezes at identity; with it the
    # stream dead-reckons the LO seed: finite and actually moving
    vo_on = results["on"]["traj_VO"]
    vo_off = results["off"]["traj_VO"]
    assert np.isfinite(vo_on).all()
    assert np.linalg.norm(vo_off[-1, :, 3] - vo_off[1, :, 3]) < 1e-4
    moved = np.linalg.norm(vo_on[-1, :, 3] - vo_on[1, :, 3])
    assert moved > 0.2, moved
    # the dead-reckoned stream lags its LO seed by one frame, so its ATE is
    # bounded by ~one frame of motion (speed 1.0 m/frame here) — finite and
    # usable, unlike the frozen stream
    m_vo = kitti_metrics(gt, vo_on, step=1)
    assert m_vo["ate_rmse_m"] < 2.0, m_vo
