"""Benchmark ring_assoc pallas kernel vs shortlist_ring_assoc on the chip."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from legacy_assoc import shortlist_ring_assoc
from vloam_tpu.lidar.ring_assoc import (RingSlab, SENTINEL, ring_min2_pallas,
                                        ring_min2_xla, ring_slab_assoc,
                                        slab_from_flat)
from vloam_tpu.runtime.profiling import fence

from profile_chained import chained


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    for name, S, C, Q in (("corner", 64, 128, 1024), ("surf", 64, 512, 2048)):
        slab = np.full((S, C, 3), SENTINEL, np.float32)
        flat_xyz = np.zeros((S * C, 3), np.float32)
        flat_ring = np.repeat(np.arange(S, dtype=np.int32), C)
        for s in range(S):
            th = np.linspace(0, 2 * np.pi, C, endpoint=False)
            r = 10.0 + 0.9 * s
            pts = np.stack([r * np.cos(th), r * np.sin(th),
                            np.full(C, 0.1 * s)], 1).astype(np.float32)
            pts += rng.normal(0, 0.03, pts.shape).astype(np.float32)
            slab[s] = pts
            flat_xyz[s * C:(s + 1) * C] = pts
        mask = np.ones(S * C, bool)
        q = flat_xyz[rng.choice(S * C, Q, replace=False)] + rng.normal(
            0, 0.05, (Q, 3)).astype(np.float32)

        qj = jnp.asarray(q)
        slab_t = jnp.asarray(np.swapaxes(slab, 1, 2))
        slab_j = RingSlab(jnp.asarray(slab))
        fx, fr, fm = (jnp.asarray(flat_xyz), jnp.asarray(flat_ring),
                      jnp.asarray(mask))

        # correctness vs xla on chip
        ref = jax.jit(ring_min2_xla)(qj, slab_t)
        got = ring_min2_pallas(qj, slab_t)
        for k, (r_, g_) in enumerate(zip(ref, got)):
            r_, g_ = np.asarray(r_), np.asarray(g_)
            bad = ~np.isclose(r_.astype(np.float64), g_.astype(np.float64),
                              rtol=1e-4, atol=1e-3)
            print(f"{name} out{k}: mismatches {bad.sum()}/{bad.size}",
                  flush=True)

        chained(f"{name}: ring_min2_pallas [{S}x{C}] Q={Q}",
                lambda qq: ring_min2_pallas(qq, slab_t), qj)
        chained(f"{name}: ring_slab_assoc (full)",
                lambda qq: ring_slab_assoc(qq, slab_j, 2.5, "surf"), qj)
        chained(f"{name}: shortlist_ring_assoc (old)",
                lambda qq: shortlist_ring_assoc(qq, fx, fr, fm, 2.5, "surf",
                                                24), qj)
        chained(f"{name}: slab_from_flat",
                lambda xx: slab_from_flat(xx, fr, fm, S, C).xyz, fx)


if __name__ == "__main__":
    main()
