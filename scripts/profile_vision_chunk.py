"""Time vision_lo_run_chunk (program 1: vision+scanreg+LO) compile +
steady-state on the chip."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

import jax
import os
cache_dir = "/tmp/vloam_jax_cache"
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.vloam_step import (CamExtrinsics, VisionLoState,
                                  vision_lo_run_chunk)
from vloam_tpu.runtime.profiling import fence

chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = kitti_hdl64().replace(detach_VO_LO=False)
K, P_rect0, cam_T_velo, velo_T_cam = synthetic.default_cam_calib(
    cfg.vo.img_width, cfg.vo.img_height)

class C: pass
calib = C()
calib.K = K; calib.P_rect0 = P_rect0
calib.P_velo_to_img = P_rect0 @ np.linalg.inv(velo_T_cam)
calib.imu_T_velo = np.eye(4); calib.imu_T_cam0 = velo_T_cam
ext = CamExtrinsics.from_calib(calib)

rng = np.random.default_rng(0)
scans = jnp.asarray(rng.uniform(-40, 40, (chunk, cfg.lidar.max_points, 3)).astype(np.float32))
ns = jnp.full((chunk,), cfg.lidar.max_points, jnp.int32)
imgs = jnp.asarray(rng.integers(0, 255, (chunk, cfg.vo.img_height, cfg.vo.img_width), dtype=np.uint8))
q0 = jnp.asarray([0, 0, 0, 1], jnp.float32)
t0_ = jnp.zeros(3, jnp.float32)

vstate = VisionLoState.create(cfg)
t0 = time.perf_counter()
out = vision_lo_run_chunk(vstate, scans, ns, imgs, ext, cfg)
vstate = out[0]
fence(vstate)
print(f"compile+first chunk: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
for _ in range(3):
    out = vision_lo_run_chunk(vstate, scans, ns, imgs, ext, cfg)
    vstate = out[0]
fence(vstate)
dt = time.perf_counter() - t0
print(f"steady: {dt/3/chunk*1000:.1f} ms/frame ({3*chunk/dt:.1f} fps vision+LO)")
