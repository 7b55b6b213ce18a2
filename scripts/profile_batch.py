"""Isolate where BatchLoamEngine's scaling goes: device-only chunk time for
B = 1/2/4/8 with pre-staged (already-uploaded) polar chunks, vs the
end-to-end push_polar path. If device time grows ~linearly with B the vmap
is the problem; if it stays flat the host staging/upload path is."""

import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.lidar.loam_step import (batch_states,
                                           loam_run_chunk_batch_polar,
                                           loam_run_chunk_polar, LoamState)
    from vloam_tpu.runtime.profiling import fence

    cfg = kitti_hdl64()
    chunk = 8
    n_chunks = 3
    elev = jnp.asarray(np.radians(synthetic.hdl64_elevations(64)), jnp.float32)

    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(chunk * (n_chunks + 1), speed=1.1,
                                       yaw_rate=0.01)
    frames = [synthetic.simulate_scan_polar(scene, T, n_scans=64,
                                            n_azimuth=1800, seed=k)
              for k, T in enumerate(poses)]
    chunks = [np.stack(frames[i * chunk:(i + 1) * chunk])
              for i in range(n_chunks + 1)]

    # single-stream reference (the bench.py path)
    st = LoamState.create(cfg)
    pq = jnp.zeros((chunk, 4), jnp.float32).at[:, 3].set(1.0)
    pt = jnp.zeros((chunk, 3), jnp.float32)
    up = jnp.zeros((chunk,), bool)
    dev_chunks = [jax.device_put(jnp.asarray(c)) for c in chunks]
    fence(dev_chunks)
    st, _ = loam_run_chunk_polar(st, dev_chunks[0], elev, pq, pt, up, cfg)
    fence(st)
    t0 = time.perf_counter()
    for c in dev_chunks[1:]:
        st, _ = loam_run_chunk_polar(st, c, elev, pq, pt, up, cfg)
    fence(st)
    dt = time.perf_counter() - t0
    print(f"B=1 device-only: {1000*dt/(n_chunks*chunk):.2f} ms/frame "
          f"({n_chunks*chunk/dt:.1f} fps)")

    for B in (2, 4, 8):
        sts = batch_states(cfg, B)
        bchunks = [jax.device_put(jnp.broadcast_to(
            jnp.asarray(c), (B,) + c.shape).copy()) for c in chunks]
        fence(bchunks)
        sts, _ = loam_run_chunk_batch_polar(sts, bchunks[0], elev, cfg)
        fence(sts)
        t0 = time.perf_counter()
        for c in bchunks[1:]:
            sts, _ = loam_run_chunk_batch_polar(sts, c, elev, cfg)
        fence(sts)
        dt = time.perf_counter() - t0
        nf = B * n_chunks * chunk
        print(f"B={B} device-only: {1000*dt/nf:.2f} ms/frame-aggregate "
              f"({nf/dt:.1f} fps aggregate)")


if __name__ == "__main__":
    main()
