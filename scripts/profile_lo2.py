"""LO association decomposition: distance matmul precision, approx_min_k,
shortlist re-ranking, LM. Chained timing; run ALONE on the chip."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.lidar import scan_registration as sr
from legacy_assoc import shortlist_ring_assoc
from vloam_tpu.lidar.knn import _dist_sq
from vloam_tpu.lidar.odometry import solve_lo
from vloam_tpu.runtime.profiling import fence

ITERS = 32


def chained(label, fn, *args, iters=ITERS):
    def body(carry, _):
        perturbed, done = [], False
        for a in args:
            if (not done and hasattr(a, "dtype")
                    and jnp.issubdtype(a.dtype, jnp.floating)):
                perturbed.append(a + carry)
                done = True
            else:
                perturbed.append(a)
        out = fn(*perturbed)
        leaf = [x for x in jax.tree_util.tree_leaves(out)
                if jnp.issubdtype(x.dtype, jnp.floating)][0]
        return (leaf.reshape(-1)[0] * 0.0).astype(jnp.float32), None

    @jax.jit
    def run():
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    fence(run())
    t0 = time.perf_counter()
    out = run()
    fence(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:52s} {ms:9.3f} ms/iter", flush=True)
    return ms


def main():
    cfg = kitti_hdl64()
    print(f"devices: {jax.devices()}", flush=True)

    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(2, speed=1.1, yaw_rate=0.01)
    regj = jax.jit(lambda s, n: sr.register_scan(s, n, cfg.lidar, cfg.scanreg))
    feats = []
    for k, T in enumerate(poses):
        pts = synthetic.simulate_scan(scene, T, n_scans=cfg.lidar.n_scans,
                                      n_azimuth=1800, noise=0.01, seed=k)
        padded, n = synthetic.pad_scan(pts, cfg.lidar.max_points)
        feats.append(regj(jnp.asarray(padded), jnp.int32(n)))
    f0, f1 = feats
    print(f"sharp={int(f1.sharp.mask.sum())} flat={int(f1.flat.mask.sum())} "
          f"corner_last={int(f0.less_sharp.mask.sum())} "
          f"surf_last={int(f0.less_flat.mask.sum())}", flush=True)

    q0 = jnp.asarray([0, 0, 0, 1.0], jnp.float32)
    t0v = jnp.zeros(3, jnp.float32)

    chained("solve_lo (full)", lambda a, b, c, d: solve_lo(
        a, b, c, d, q0, t0v, cfg.lo)[0],
        f1.sharp, f1.flat, f0.less_sharp_slab, f0.less_flat_slab)

    sq, sm = f1.sharp.xyz, f1.sharp.mask
    cq = f0.less_sharp.xyz
    cr, cm = f0.less_sharp.ring, f0.less_sharp.mask
    fq = f1.flat.xyz
    su = f0.less_flat.xyz
    sr_, sum_ = f0.less_flat.ring, f0.less_flat.mask

    chained("assoc corner (shortlist_ring_assoc)",
            lambda q: shortlist_ring_assoc(q, cq, cr, cm, cfg.lo.nearby_scan,
                                           "corner", 24),
            sq)
    chained("assoc surf (shortlist_ring_assoc)",
            lambda q: shortlist_ring_assoc(q, su, sr_, sum_,
                                           cfg.lo.nearby_scan, "surf",
                                           24),
            fq)

    # distance matmul precision variants (surf shape: 2048 x 32768)
    for prec, name in ((jax.lax.Precision.HIGHEST, "HIGHEST"),
                       (jax.lax.Precision.HIGH, "HIGH"),
                       (jax.lax.Precision.DEFAULT, "DEFAULT(bf16)")):
        def dist_only(q, prec=prec):
            qq = jnp.sum(q * q, axis=-1, keepdims=True)
            cc = jnp.sum(su * su, axis=-1)[None, :]
            qc = jnp.dot(q, su.T, preferred_element_type=jnp.float32,
                         precision=prec)
            return jnp.maximum(qq + cc - 2.0 * qc, 0.0).sum()

        chained(f"surf dist matmul {name}", dist_only, fq)

    # approx_min_k on a fixed surf distance matrix
    dmat = jax.jit(lambda q: jnp.where(sum_[None, :], _dist_sq(q, su),
                                       jnp.inf))(fq)
    for s in (8, 16, 24):
        chained(f"approx_min_k shortlist={s}",
                lambda d, s=s: jax.lax.approx_min_k(d, s), dmat)

    # fused: DEFAULT-precision dist + approx_min_k + exact f32 re-rank
    def fused_shortlist(q):
        qq = jnp.sum(q * q, axis=-1, keepdims=True)
        cc = jnp.sum(su * su, axis=-1)[None, :]
        qc = jnp.dot(q, su.T, preferred_element_type=jnp.float32)
        d = jnp.where(sum_[None, :],
                      jnp.maximum(qq + cc - 2.0 * qc, 0.0), jnp.inf)
        sl_d, sl_i = jax.lax.approx_min_k(d, 24)
        c_sl = su[sl_i]  # [Q, 24, 3]
        d_exact = jnp.sum((c_sl - q[:, None, :]) ** 2, axis=-1)
        return d_exact.sum()

    chained("surf: bf16 dist + amk24 + f32 re-rank", fused_shortlist, fq)


if __name__ == "__main__":
    main()
