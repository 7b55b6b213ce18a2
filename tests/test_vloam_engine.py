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
