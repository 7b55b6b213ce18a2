"""Variant shootout for per-ring min association on the chip."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vloam_tpu.lidar.ring_assoc import SENTINEL, ring_min2_pallas
from profile_chained import chained

_BIG = 3.9e12
RB = 8


def make(S, C, Q, seed=0):
    rng = np.random.default_rng(seed)
    slab = np.full((S, C, 3), SENTINEL, np.float32)
    for s in range(S):
        th = np.linspace(0, 2 * np.pi, C, endpoint=False)
        r = 10.0 + 0.9 * s
        pts = np.stack([r * np.cos(th), r * np.sin(th),
                        np.full(C, 0.1 * s)], 1).astype(np.float32)
        slab[s] = pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)
    q = slab.reshape(-1, 3)[rng.choice(S * C, Q, replace=False)]
    return jnp.asarray(q), jnp.asarray(np.swapaxes(slab, 1, 2))


# --- variant A: argmin-based pallas kernel ---
def _kern_argmin(q_ref, c_ref, dmin_ref, amin_ref, d2_ref, a2_ref):
    q = q_ref[:]
    qx = [q[:, ax][:, None] for ax in range(3)]
    for r in range(RB):
        c = c_ref[r]
        d = jnp.zeros((q.shape[0], c.shape[1]), jnp.float32)
        for ax in range(3):
            diff = qx[ax] - c[ax][None, :]
            d = d + diff * diff
        a1 = jnp.argmin(d, axis=1).astype(jnp.int32)
        m1 = jnp.min(d, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d_wo = jnp.where(col == a1[:, None], _BIG, d)
        a2 = jnp.argmin(d_wo, axis=1).astype(jnp.int32)
        m2 = jnp.min(d_wo, axis=1)
        dmin_ref[r, :] = m1
        amin_ref[r, :] = a1
        d2_ref[r, :] = m2
        a2_ref[r, :] = a2


# --- variant B: min-only (corner mode: no second-min) ---
def _kern_min1(q_ref, c_ref, dmin_ref, amin_ref):
    q = q_ref[:]
    qx = [q[:, ax][:, None] for ax in range(3)]
    for r in range(RB):
        c = c_ref[r]
        d = jnp.zeros((q.shape[0], c.shape[1]), jnp.float32)
        for ax in range(3):
            diff = qx[ax] - c[ax][None, :]
            d = d + diff * diff
        amin_ref[r, :] = jnp.argmin(d, axis=1).astype(jnp.int32)
        dmin_ref[r, :] = jnp.min(d, axis=1)


@partial(jax.jit, static_argnames=("kern", "qt", "n_out"))
def run_pallas(kern, queries, slab_t, qt=512, n_out=4):
    Q = queries.shape[0]
    S, _, C = slab_t.shape
    outs = []
    for k in range(n_out // 2):
        outs += [jax.ShapeDtypeStruct((S, Q), jnp.float32),
                 jax.ShapeDtypeStruct((S, Q), jnp.int32)]
    return pl.pallas_call(
        kern,
        grid=(S // RB, Q // qt),
        in_specs=[
            pl.BlockSpec((qt, 3), lambda s, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 3, C), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((RB, qt), lambda s, i: (s, i),
                                memory_space=pltpu.VMEM)
                   for _ in range(n_out)],
        out_shape=outs,
    )(queries, slab_t)


# --- variant C: XLA vmap over rings ---
@jax.jit
def xla_vmap(queries, slab_t):
    def one_ring(c):
        diff = queries[:, :, None] - c[None, :, :]
        d = jnp.sum(diff * diff, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        a1 = jnp.argmin(d, axis=1).astype(jnp.int32)
        m1 = jnp.min(d, axis=1)
        d_wo = jnp.where(col == a1[:, None], _BIG, d)
        a2 = jnp.argmin(d_wo, axis=1).astype(jnp.int32)
        m2 = jnp.min(d_wo, axis=1)
        return m1, a1, m2, a2

    return jax.vmap(one_ring)(slab_t)


# --- variant D: XLA one-shot broadcast ---
@jax.jit
def xla_oneshot(queries, slab_t):
    diff = queries[None, :, :, None] - slab_t[:, None, :, :]  # [S,Q,3,C]
    d = jnp.sum(diff * diff, axis=2)  # [S, Q, C]
    a1 = jnp.argmin(d, axis=2).astype(jnp.int32)
    m1 = jnp.min(d, axis=2)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 2)
    d_wo = jnp.where(col == a1[..., None], _BIG, d)
    a2 = jnp.argmin(d_wo, axis=2).astype(jnp.int32)
    m2 = jnp.min(d_wo, axis=2)
    return m1, a1, m2, a2


def main():
    print(jax.devices(), flush=True)
    for name, S, C, Q in (("corner", 64, 128, 1024), ("surf", 64, 512, 2048)):
        q, slab_t = make(S, C, Q)
        ref = ring_min2_pallas(q, slab_t)
        for lbl, fn in (
            ("pallas argmin", lambda qq: run_pallas(_kern_argmin, qq, slab_t)),
            ("pallas min1   ", lambda qq: run_pallas(_kern_min1, qq, slab_t,
                                                     n_out=2)),
            ("xla vmap      ", lambda qq: xla_vmap(qq, slab_t)),
            ("xla oneshot   ", lambda qq: xla_oneshot(qq, slab_t)),
        ):
            try:
                got = fn(q)
                ok = all(
                    np.allclose(np.asarray(g), np.asarray(r), rtol=1e-4,
                                atol=1e-3)
                    for g, r in zip(got, ref))
                chained(f"{name}: {lbl} ok={ok}", fn, q)
            except Exception as e:
                print(f"{name}: {lbl} FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
