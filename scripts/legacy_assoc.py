"""LEGACY: one-pass shortlist LO association, superseded in round 2 by
ring_assoc.ring_slab_assoc (exact per-ring min). Retired here from
vloam_tpu.lidar.knn — kept ONLY as a comparison baseline for the profiling
scripts (profile_ring_assoc.py, profile_lo2.py); not a production path.
"""

from functools import partial

import jax
import jax.numpy as jnp

from vloam_tpu.lidar.knn import _dist_sq, _INF


@partial(jax.jit, static_argnames=("mode", "shortlist"))
def shortlist_ring_assoc(
    queries: jnp.ndarray,
    cands: jnp.ndarray,
    c_ring: jnp.ndarray,
    c_mask: jnp.ndarray,
    nearby_scan: float,
    mode: str = "corner",
    shortlist: int = 24,
):
    """LO correspondence search via a distance shortlist (one pass).

    The exact formulation (knn.nearest_and_ring_constrained) sweeps the
    [Q, C] distance matrix twice — once for the global nearest, once for the
    ring-constrained picks, because the constraint depends on the nearest's
    ring. This computes distances ONCE and derives all picks from the top-
    `shortlist` candidates: exact whenever the constrained pick is within
    the query's `shortlist` nearest candidates; a rare miss just drops that
    residual. Returns the same dict as the exact form.
    """
    Q = queries.shape[0]
    d = jnp.where(c_mask[None, :], _dist_sq(queries, cands), _INF)
    # approx_min_k is a fused partial reduction (1.4 ms on [2k, 33k] vs
    # 14 ms for exact top_k): its top-1 is always exact (the global min
    # survives any bucketing), and a ~5% per-element miss deeper in the
    # shortlist at most drops that residual.
    sl_d, sl_i = jax.lax.approx_min_k(d, shortlist)  # [Q, s] ascending
    d0, i0 = sl_d[:, 0], sl_i[:, 0]
    ring0 = c_ring[i0]
    rings = c_ring[sl_i]  # [Q, s]
    diff = rings - ring0[:, None]
    near = jnp.abs(diff).astype(jnp.float32) <= nearby_scan
    d_other = jnp.where((diff != 0) & near, sl_d, _INF)
    a2 = jnp.argmin(d_other, axis=1)
    d2 = jnp.take_along_axis(d_other, a2[:, None], 1)[:, 0]
    i2 = jnp.take_along_axis(sl_i, a2[:, None], 1)[:, 0]
    if mode == "surf":
        d_same = jnp.where((diff == 0) & (sl_i != i0[:, None]), sl_d, _INF)
        a3 = jnp.argmin(d_same, axis=1)
        d3 = jnp.take_along_axis(d_same, a3[:, None], 1)[:, 0]
        i3 = jnp.take_along_axis(sl_i, a3[:, None], 1)[:, 0]
    else:
        d3 = jnp.full((Q,), _INF)
        i3 = jnp.zeros((Q,), jnp.int32)
    return {"d0": d0, "i0": i0, "d2": d2, "i2": i2, "d3": d3, "i3": i3}
