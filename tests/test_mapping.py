import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vloam_tpu.config import (LaserMappingConfig, LaserOdometryConfig,
                              LidarProfile, ScanRegistrationConfig)
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr
from vloam_tpu.lidar.mapping import CubeMap, LaserMapping, _cube_coord, _slot_of
from vloam_tpu.lidar.odometry import LaserOdometry

PROFILE = LidarProfile(name="t64", n_scans=64, minimum_range=2.0,
                       max_points=65536, ring_capacity=1024)
SR_CFG = ScanRegistrationConfig(sharp_cap=1024, less_sharp_cap=8192,
                                flat_cap=2048, less_flat_cap=16384)
MAP_CFG = LaserMappingConfig(cube_width=11, cube_height=11, cube_depth=5,
                             cube_corner_capacity=512, cube_surf_capacity=1024,
                             corner_stack_cap=2048, surf_stack_cap=4096)


def extract(scene, T, n_az=900, seed=0):
    pts = synthetic.simulate_scan(scene, T, n_scans=64, n_azimuth=n_az,
                                  noise=0.01, seed=seed)
    padded, n = synthetic.pad_scan(pts, PROFILE.max_points)
    return sr.register_scan(jnp.asarray(padded), jnp.int32(n), PROFILE, SR_CFG)


def test_cube_coord_matches_reference_semantics():
    # int((x+25)/50) with negative correction == floor
    pts = jnp.asarray([[0.0, 0, 0], [24.9, 0, 0], [25.1, 0, 0],
                       [-25.1, 0, 0], [-24.9, 0, 0], [75.0, 0, 0]])
    c = np.asarray(_cube_coord(pts, 50.0))
    np.testing.assert_array_equal(c[:, 0], [0, 0, 1, -1, 0, 2])


def test_slot_roundtrip():
    cfg = MAP_CFG
    # distinct cubes within one window period get distinct slots
    coords = jnp.asarray([[0, 0, 0], [10, 10, 4], [5, 3, 2], [2, -4, 1]])
    slots = np.asarray(_slot_of(coords, cfg))
    assert len(set(slots.tolist())) == 4
    assert (slots >= 0).all() and (slots < 11 * 11 * 5).all()
    # cubes a full period apart alias to the same slot (circular buffer);
    # slot_coord disambiguates them
    alias = jnp.asarray([[0, 0, 0], [11, 0, 0], [-1, -1, -1], [10, 10, 4]])
    s = np.asarray(_slot_of(alias, cfg))
    assert s[0] == s[1] and s[2] == s[3]


def test_mapping_improves_or_tracks_lo():
    """Run LO + mapping over a short drive; the map-refined trajectory must
    stay at least as accurate as raw LO."""
    scene = synthetic.urban_scene(5)
    n = 6
    poses = synthetic.drive_trajectory(n, speed=1.0, yaw_rate=0.02)
    lo = LaserOdometry(LaserOdometryConfig())
    mo = LaserMapping(MAP_CFG)
    mo_err = lo_err = None
    for k in range(n):
        feats = extract(scene, poses[k], seed=k)
        out = lo.step(feats)
        res = mo.step(feats.less_sharp, feats.less_flat,
                      out["q_w"], out["t_w"], skip_frame=False)
        gt = poses[k]
        lo_err = np.linalg.norm(out["t_w"] - gt[:3, 3])
        mo_err = np.linalg.norm(res["t_w"] - gt[:3, 3])
    assert mo.last_stats["n_map_corner"] > 10
    assert mo.last_stats["n_map_surf"] > 50
    assert bool(mo.last_stats["solved"])
    assert mo_err < max(2.0 * lo_err, 0.3), (mo_err, lo_err)
    # map cubes should be populated around the vehicle
    assert int(jnp.sum(mo.map.corner_cnt)) > 100
    assert int(jnp.sum(mo.map.surf_cnt)) > 500


def test_mapping_solve_corrects_perturbed_prediction():
    """Feed mapping a deliberately biased odometry pose; the scan-to-map
    solve must pull it back toward ground truth."""
    scene = synthetic.urban_scene(9)
    poses = synthetic.drive_trajectory(3, speed=1.0, yaw_rate=0.0)
    lo = LaserOdometry(LaserOdometryConfig())
    mo = LaserMapping(MAP_CFG)
    for k in range(2):
        feats = extract(scene, poses[k], seed=k)
        out = lo.step(feats)
        mo.step(feats.less_sharp, feats.less_flat, out["q_w"], out["t_w"])
    feats = extract(scene, poses[2], seed=2)
    out = lo.step(feats)
    # bias the odometry input by 0.3 m
    biased_t = np.asarray(out["t_w"]) + np.array([0.3, 0.15, 0.0])
    res = mo.step(feats.less_sharp, feats.less_flat, out["q_w"], biased_t)
    gt = poses[2][:3, 3]
    err_biased = np.linalg.norm(biased_t + mo.t_wmap_wodom * 0 - gt)  # ~0.34
    err_mo = np.linalg.norm(res["t_w"] - gt)
    assert err_mo < 0.5 * err_biased, (err_mo, err_biased)
