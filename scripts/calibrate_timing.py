"""Calibrate timing methodology on the axon backend.

Subjects: a known-FLOPs matmul and register_scan. Methods:
  A) per-call with fence each call (profile_stages style)
  B) N async dispatches w/ DIFFERENT inputs, one fence (bench/pipeline style)
  C) N async dispatches w/ IDENTICAL inputs, one fence (memoization probe)
  D) lax.scan-chained N iterations in one program (profile_chained style)

f32 4096^3 matmul = 137 GFLOP; v5e-1 peak ~49 TFLOP/s f32 -> ~2.8 ms/iter
floor. Disagreement between methods reveals what each actually measures.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.runtime.profiling import fence

N = 8


def method_A(fn, inputs):
    out = fn(inputs[0]); fence(out)
    t0 = time.perf_counter()
    for k in range(N):
        out = fn(inputs[k % len(inputs)])
        fence(out)
    return (time.perf_counter() - t0) / N * 1e3


def method_B(fn, inputs):
    out = fn(inputs[0]); fence(out)
    t0 = time.perf_counter()
    outs = [fn(inputs[k % len(inputs)]) for k in range(N)]
    for o in outs:
        fence(o)
    return (time.perf_counter() - t0) / N * 1e3


def method_C(fn, inputs):
    out = fn(inputs[0]); fence(out)
    t0 = time.perf_counter()
    outs = [fn(inputs[0]) for _ in range(N)]
    for o in outs:
        fence(o)
    return (time.perf_counter() - t0) / N * 1e3


def method_D(fn, inputs):
    x0 = inputs[0]

    def body(c, _):
        out = fn(x0 + c)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return (leaf.reshape(-1)[0] * 0).astype(x0.dtype), None

    @jax.jit
    def run():
        c, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), None, length=N)
        return c

    out = run(); fence(out)
    t0 = time.perf_counter()
    out = run(); fence(out)
    return (time.perf_counter() - t0) / N * 1e3


def report(name, fn, inputs):
    for m, f in (("A percall+fence", method_A), ("B pipelined-diff", method_B),
                 ("C pipelined-same", method_C), ("D scan-chained", method_D)):
        ms = f(fn, inputs)
        print(f"{name:24s} {m:18s} {ms:9.2f} ms/iter", flush=True)


def main():
    rng = np.random.default_rng(0)

    mm = jax.jit(lambda a: a @ a)
    mats = [jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)
            for _ in range(2)]
    report("matmul4096 f32", mm, mats)

    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.lidar import scan_registration as sr

    cfg = kitti_hdl64()
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(3, speed=1.1, yaw_rate=0.01)
    scans = []
    for k, T in enumerate(poses):
        pts = synthetic.simulate_scan(scene, T, n_scans=cfg.lidar.n_scans,
                                      n_azimuth=1800, noise=0.01, seed=k)
        padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
        scans.append(jnp.asarray(padded))
    npts = jnp.int32(108000)
    reg = jax.jit(lambda s: sr.register_scan(s, npts, cfg.lidar, cfg.scanreg))
    report("register_scan", reg, scans)


if __name__ == "__main__":
    main()
