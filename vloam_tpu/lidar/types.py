"""Fixed-shape point-cloud containers (padded tensors + masks).

Every ragged pcl::PointCloud in the reference becomes a (points, ring,
rel_time, mask) bundle with a static capacity here, so the whole pipeline
stays jit-compatible.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FeatureCloud(NamedTuple):
    """A padded feature point set.

    xyz      [cap, 3]  float32 (sensor frame)
    ring     [cap]     int32   scan line id (int(intensity) in the reference)
    rel_time [cap]     float32 azimuth-relative time in [0, 1)
    mask     [cap]     bool
    """

    xyz: jnp.ndarray
    ring: jnp.ndarray
    rel_time: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(cap: int, dtype=jnp.float32) -> "FeatureCloud":
        return FeatureCloud(
            xyz=jnp.zeros((cap, 3), dtype),
            ring=jnp.zeros((cap,), jnp.int32),
            rel_time=jnp.zeros((cap,), dtype),
            mask=jnp.zeros((cap,), bool),
        )


class ScanFeatures(NamedTuple):
    """Output of scan registration (reference scan_registration.cpp output()):
    the five clouds of A-LOAM, plus the LO candidate sets in the per-ring
    slab layout the association kernel consumes (ring_assoc.RingSlab;
    sentinel-padded [n_scans, cap_per_ring, 3])."""

    sharp: FeatureCloud
    less_sharp: FeatureCloud
    flat: FeatureCloud
    less_flat: FeatureCloud
    full: FeatureCloud  # ring-ordered filtered cloud (laserCloud)
    less_sharp_slab: "jnp.ndarray | object" = None  # RingSlab
    less_flat_slab: "jnp.ndarray | object" = None  # RingSlab
