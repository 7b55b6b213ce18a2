"""Does the axon tunnel overlap host->device transfers with device compute?

bench.py r5 decomposition: device 7.39 ms/frame + upload 3.35 ms/frame and
e2e = their SUM -> transfers serialize with compute. This measures four
staging strategies for the fused LOAM polar chunk on the real chip:

  A  stack on host, one jnp.asarray per chunk at flush (current engine)
  B  jnp.asarray per frame at push time (transfer can start during the
     previous chunk's compute IF the backend overlaps), device-side stack
  C  A + pack12 (12-bit packed: 25% fewer bytes)
  D  B + pack12

If B ~= A the backend serializes and pack12 is the only upload lever.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _cache():
    import os

    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/vloam_jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    _cache()
    import jax.numpy as jnp

    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.lidar.loam_step import (LoamState, loam_run_chunk_polar,
                                           pack12)
    from vloam_tpu.runtime.profiling import fence

    cfg = kitti_hdl64()
    scene = synthetic.urban_scene(0, extent=80.0)
    chunk, n_chunks = 16, 4
    n = chunk * (n_chunks + 1)
    poses = synthetic.drive_trajectory(n, speed=1.1, yaw_rate=0.01)
    cache = Path("/tmp/vloam_overlap_cache.npz")
    if cache.exists():
        with np.load(cache) as z:
            frames = [z[k] for k in z.files]
    else:
        frames = [synthetic.simulate_scan_polar(
            scene, T, n_scans=64, n_azimuth=1800, noise=0.01, seed=k,
            range_scale=0.03) for k, T in enumerate(poses)]
        np.savez(cache, *frames)
    frames = [np.minimum(f, 4095).astype(np.uint16) for f in frames]
    elev = jnp.asarray(np.radians(synthetic.hdl64_elevations(64)), jnp.float32)
    pq = jnp.zeros((chunk, 4), jnp.float32).at[:, 3].set(1.0)
    pt = jnp.zeros((chunk, 3), jnp.float32)
    up = jnp.zeros((chunk,), bool)

    def run(mode):
        st = LoamState.create(cfg)
        packed = mode in ("C", "D")
        per_frame = mode in ("B", "D")

        def stage_chunk(i):
            fs = frames[i:i + chunk]
            if packed:
                fs = [pack12(f) for f in fs]
            if per_frame:
                return [jnp.asarray(f) for f in fs]
            return jnp.asarray(np.stack(fs))

        def dispatch(st, staged):
            arr = (jnp.stack(staged) if isinstance(staged, list)
                   else staged)
            st, _ = loam_run_chunk_polar(st, arr, elev, pq, pt, up, cfg,
                                         0.03)
            return st

        # warmup chunk (compile)
        st = dispatch(st, stage_chunk(0))
        fence(st)
        t0 = time.perf_counter()
        staged = stage_chunk(chunk)
        for i in range(1, n_chunks):
            st = dispatch(st, staged)
            # stage the NEXT chunk while this one computes
            staged = stage_chunk((i + 1) * chunk)
        st = dispatch(st, staged)
        fence(st)
        dt = time.perf_counter() - t0
        return n_chunks * chunk / dt

    for mode in ("A", "B", "C", "D", "A", "B", "C", "D"):
        fps = run(mode)
        print(f"mode {mode}: {fps:7.2f} fps e2e", flush=True)


if __name__ == "__main__":
    main()
