"""Time loam_run_chunk (xyz ingest) compile + steady on the chip."""
import sys, time, os
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
cache_dir = "/tmp/vloam_jax_cache"
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from vloam_tpu.config import kitti_hdl64
from vloam_tpu.lidar.loam_step import LoamState, loam_run_chunk
from vloam_tpu.runtime.profiling import fence

chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = kitti_hdl64().replace(detach_VO_LO=False)
rng = np.random.default_rng(0)
scans = jnp.asarray(rng.uniform(-40, 40, (chunk, cfg.lidar.max_points, 3)).astype(np.float32))
ns = jnp.full((chunk,), cfg.lidar.max_points, jnp.int32)
pq = jnp.zeros((chunk, 4), jnp.float32).at[:, 3].set(1.0)
pt = jnp.zeros((chunk, 3), jnp.float32)
up = jnp.zeros((chunk,), bool)
state = LoamState.create(cfg)
t0 = time.perf_counter()
state, outs = loam_run_chunk(state, scans, ns, pq, pt, up, cfg, 1.0)
fence(state)
print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
for _ in range(2):
    state, outs = loam_run_chunk(state, scans, ns, pq, pt, up, cfg, 1.0)
fence(state)
dt = time.perf_counter() - t0
print(f"steady: {dt/2/chunk*1000:.1f} ms/frame ({2*chunk/dt:.1f} fps)")
