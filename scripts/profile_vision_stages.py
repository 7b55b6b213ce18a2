"""Chained per-stage profile of the vision pipeline on the chip."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/vloam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.vision import features
from vloam_tpu.vision.depth_map import build_depth_grid, query_depth
from vloam_tpu.vision.vo import solve_vo
sys.path.insert(0, str(Path(__file__).parent))
from profile_chained import chained

cfg = kitti_hdl64()
vo = cfg.vo
scene = synthetic.urban_scene(0, extent=80.0)
K, P_rect0, cam_T_velo, velo_T_cam = synthetic.default_cam_calib(
    vo.img_width, vo.img_height)
P = jnp.asarray(P_rect0 @ np.linalg.inv(velo_T_cam), jnp.float32)
T = synthetic.drive_trajectory(2)[1]
img = jnp.asarray(synthetic.render_camera(scene, T @ velo_T_cam, K,
                                          vo.img_width, vo.img_height))
pts = synthetic.simulate_scan(scene, T, n_scans=64, n_azimuth=1800, seed=1)
padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
scan = jnp.asarray(padded)
mask = jnp.arange(len(scan)) < n

xy, sc, m = jax.jit(lambda i: features.detect_keypoints(i, vo))(img)
desc = jax.jit(lambda i, x: features.describe_keypoints(i, x, vo))(img, xy)
grid = jax.jit(lambda s, mm: build_depth_grid(s, mm, P, vo))(scan, mask)

chained("detect_keypoints (2048, 1242x375)", lambda i: features.detect_keypoints(i, vo)[0], img)
chained("describe_keypoints (2048 x 24x24)", lambda i: features.describe_keypoints(i, xy, vo), img)
chained("match_descriptors (2048x2048x576)", lambda d: features.match_descriptors(
    d, m, desc, m, vo.match_ratio, matcher=vo.matcher, select=vo.match_select)[0].astype(jnp.float32), desc)
chained("build_depth_grid (131k pts)", lambda s: build_depth_grid(s, mask, P, vo).z, scan)
chained("query_depth (2048)", lambda x: query_depth(grid, x, vo), xy)
chained("solve_vo (32 LM iters)", lambda x: solve_vo(
    x, xy, m, grid, jnp.asarray(K, jnp.float32),
    jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32), vo)[1], xy)
