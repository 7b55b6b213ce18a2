"""Timing + observability utilities.

Replaces the reference's TicToc stopwatch (tic_toc.h:10-32), the
loam_verbose_level gated prints, and the >100 ms frame-budget watchdog
(lidar_odometry_mapping.cpp:150-153). Adds a jax.profiler trace context for
TPU-level profiling.
"""

from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger("vloam_tpu")


class TicToc:
    def __init__(self):
        self.tic()

    def tic(self):
        self.t0 = time.perf_counter()

    def toc_ms(self) -> float:
        return (time.perf_counter() - self.t0) * 1000.0


class Watchdog:
    """Frame-budget monitor: warns when a frame exceeds the budget."""

    def __init__(self, budget_ms: float = 100.0, verbose: bool = False):
        self.budget_ms = budget_ms
        self.verbose = verbose
        self.overruns = 0
        self.frames = 0

    def check(self, elapsed_ms: float) -> bool:
        self.frames += 1
        over = elapsed_ms > self.budget_ms
        if over:
            self.overruns += 1
            if self.verbose:
                log.warning("frame took %.1f ms (budget %.0f ms)",
                            elapsed_ms, self.budget_ms)
        return over


def fence(tree) -> None:
    """True device fence: block until every program producing `tree` has
    actually executed.

    `jax.block_until_ready` is NOT a reliable fence on every platform (the
    experimental remote-TPU "axon" backend returns immediately from it while
    compute is still in flight — measured: an 8.8 ms matmul "blocks" in
    0.2 ms). A device->host fetch of an output buffer, however, must wait
    for the producing executable, so we fetch the smallest leaf of each
    distinct program's output. All timing in this framework must use this,
    never bare block_until_ready.
    """
    import jax
    import numpy as np

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    if not leaves:
        return
    # One fetch is enough when everything hangs off one program. The fetch
    # must be a SINGLE element: the host<->device tunnel moves only ~26 MB/s,
    # so fetching a whole leaf would time the transfer, not the compute. The
    # [0...] slice is a tiny dependent program; fetching its 4-byte result
    # waits on the producer.
    smallest = min(leaves, key=lambda x: x.size)
    first = smallest[(0,) * smallest.ndim] if smallest.ndim else smallest
    np.asarray(jax.device_get(first))


@contextlib.contextmanager
def device_trace(out_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_timings(stats: list[dict]) -> dict:
    """Mean per-stage ms over a run (skipping warmup frame 0/1 compiles)."""
    if not stats:
        return {}
    keys = set().union(*stats)
    body = stats[2:] if len(stats) > 4 else stats
    out = {}
    for k in sorted(keys):
        vals = [s[k] for s in body if k in s]
        if vals:
            out[k] = sum(vals) / len(vals)
    return out
