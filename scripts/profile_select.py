"""Selection-loop variants: strict sequential sectors vs batched rounds."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr
from profile_chained import chained


def main():
    cfg = kitti_hdl64()
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(2, speed=1.1, yaw_rate=0.01)
    r_img = jnp.asarray(synthetic.simulate_scan_polar(
        scene, poses[1], n_scans=64, n_azimuth=1800, noise=0.01, seed=1))
    elev = jnp.asarray(
        np.radians(synthetic.hdl64_elevations(64)), jnp.float32)

    strict = cfg.scanreg
    batched = dataclasses.replace(strict, strict_sector_order=False)

    for lbl, c in (("strict", strict), ("batched", batched)):
        chained(f"register_scan_polar ({lbl})",
                lambda e, cc=c: sr.register_scan_polar(
                    r_img, e, cfg.lidar, cc), elev)

    # labels diff between modes (sanity)
    fa = sr.register_scan_polar(r_img, elev, cfg.lidar, strict)
    fb = sr.register_scan_polar(r_img, elev, cfg.lidar, batched)
    for name in ("sharp", "flat"):
        na = int(getattr(fa, name).mask.sum())
        nb = int(getattr(fb, name).mask.sum())
        print(f"{name}: strict={na} batched={nb}", flush=True)


if __name__ == "__main__":
    main()
