"""Microbenchmark: random row gather from a [nb, W] HBM-resident table.

Compares XLA's native gather (`table[idx]`) against Pallas kernels that
issue per-row async DMAs with K outstanding copies. If the DMA-issue floor
is lower than XLA's serial gather loop, the mapping k-NN gather and the
sorted-segment insert should move to Pallas.
"""

import sys, time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vloam_tpu.runtime.profiling import fence

NB = 1 << 17
CAP = 32
W = 3 * CAP  # 96 f32 = 384 B rows (the corner grid row)
N_ROWS = 65536  # ~ the per-frame mapping probe row count
ITERS = 32


def chained(label, fn, *args, iters=ITERS):
    @jax.jit
    def run(a0):
        def body(c, _):
            out = fn(c, *args[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.reshape(-1)[0] * 0, None
        c, _ = jax.lax.scan(body, a0, None, length=iters)
        return c

    out = run(args[0])
    fence(out)
    t0 = time.perf_counter()
    out = run(out)
    fence(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    ns_row = ms * 1e6 / N_ROWS
    print(f"{label:46s} {ms:8.3f} ms  ({ns_row:6.1f} ns/row)", flush=True)
    return ms


def xla_gather(c, table, idx):
    return table[idx] + c


def make_pallas_gather(n_out, w, buffers):
    """Gather rows table[idx[i]] -> out[i] via per-row DMAs with `buffers`
    outstanding copies (HBM -> HBM direct; no VMEM staging)."""

    def kernel(idx_ref, table_ref, out_ref, sems):
        def get_dma(i):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[i]],
                out_ref.at[i],
                sems.at[i % buffers],
            )

        for i in range(min(buffers, n_out)):
            get_dma(i).start()

        def body(i, _):
            get_dma(i).wait()

            @pl.when(i + buffers < n_out)
            def _():
                get_dma(i + buffers).start()

            return ()

        jax.lax.fori_loop(0, n_out, body, ())

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((buffers,))],
    )

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_out, w), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table)

    return run


def make_pallas_gather_tiled(n_out, w, tile, buffers):
    """Grid over query tiles; each program DMAs its tile's rows into a VMEM
    block output (lets Mosaic overlap across grid steps too)."""

    def kernel(idx_ref, table_ref, out_ref, sems):
        t = pl.program_id(0)
        base = t * tile

        def get_dma(i):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[base + i]],
                out_ref.at[i],
                sems.at[i % buffers],
            )

        for i in range(min(buffers, tile)):
            get_dma(i).start()

        def body(i, _):
            get_dma(i).wait()

            @pl.when(i + buffers < tile)
            def _():
                get_dma(i + buffers).start()

            return ()

        jax.lax.fori_loop(0, tile, body, ())

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_out // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile, w), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((buffers,))],
    )

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_out, w), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table)

    return run


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (NB, W), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N_ROWS,), 0, NB,
                             jnp.int32)
    table, idx = jax.device_put(table), jax.device_put(idx)
    fence((table, idx))

    chained("XLA gather [65536 x 96f32]",
            lambda c, t, i: t[i] + c, jnp.float32(0), table, idx)

    for buffers in (4, 16, 64):
        try:
            f = make_pallas_gather(N_ROWS, W, buffers)
            chained(f"pallas flat DMA, {buffers} outstanding",
                    lambda c, t, i, f=f: f(i, t) + c,
                    jnp.float32(0), table, idx)
        except Exception as e:
            print(f"pallas flat {buffers}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")

    for tile, buffers in ((256, 16), (512, 32), (1024, 64)):
        try:
            f = make_pallas_gather_tiled(N_ROWS, W, tile, buffers)
            chained(f"pallas tiled t={tile} b={buffers}",
                    lambda c, t, i, f=f: f(i, t) + c,
                    jnp.float32(0), table, idx)
        except Exception as e:
            print(f"pallas tiled {tile}/{buffers}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
