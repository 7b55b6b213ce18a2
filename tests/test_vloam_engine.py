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
