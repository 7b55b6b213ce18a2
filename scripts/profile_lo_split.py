"""Split solve_lo device time: association vs LM iterations (chained)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/vloam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr
from vloam_tpu.lidar.odometry import associate_corners, associate_surfs, solve_lo, _pack
from vloam_tpu.lidar.ring_assoc import ring_slab_assoc
from vloam_tpu.runtime.profiling import fence
sys.path.insert(0, str(Path(__file__).parent))
from profile_chained import chained

cfg = kitti_hdl64()
scene = synthetic.urban_scene(0, extent=80.0)
poses = synthetic.drive_trajectory(2, speed=1.1)
feats = []
for k, T in enumerate(poses):
    pts = synthetic.simulate_scan(scene, T, n_scans=64, n_azimuth=1800, seed=k)
    padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
    feats.append(jax.jit(lambda s, n: sr.register_scan(s, n, cfg.lidar, cfg.scanreg))(jnp.asarray(padded), jnp.int32(n)))
f0, f1 = feats
x = _pack(jnp.asarray([0,0,0,1], jnp.float32), jnp.zeros(3, jnp.float32))

chained("assoc corners (Q=768)", lambda a: associate_corners(
    f1.sharp._replace(xyz=a), f0.less_sharp_slab, x, cfg.lo)[0], f1.sharp.xyz)
chained("assoc surfs (Q=1536)", lambda a: associate_surfs(
    f1.flat._replace(xyz=a), f0.less_flat_slab, x, cfg.lo)[0], f1.flat.xyz)
chained("raw ring_slab_assoc corner", lambda q: ring_slab_assoc(q, f0.less_sharp_slab, 2.5, "corner")["d0"],
        f1.sharp.xyz)
chained("raw ring_slab_assoc surf", lambda q: ring_slab_assoc(q, f0.less_flat_slab, 2.5, "surf")["d0"],
        f1.flat.xyz)
chained("solve_lo full (2 rounds x 4 LM)", lambda a: solve_lo(
    f1.sharp._replace(xyz=a), f1.flat, f0.less_sharp_slab, f0.less_flat_slab,
    jnp.asarray([0,0,0,1], jnp.float32), jnp.zeros(3, jnp.float32), cfg.lo)[1],
    f1.sharp.xyz)

chained("raw assoc surf (mxu)", lambda q: ring_slab_assoc(q, f0.less_flat_slab, 2.5, "surf", impl="mxu")["d0"],
        f1.flat.xyz)
chained("raw assoc corner (mxu)", lambda q: ring_slab_assoc(q, f0.less_sharp_slab, 2.5, "corner", impl="mxu")["d0"],
        f1.sharp.xyz)
