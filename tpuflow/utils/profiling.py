"""Profiling helpers: jax.profiler traces + block_until_ready timers.

Parity+: the reference has no profiling hooks (SURVEY.md §5 "Tracing /
profiling": none); tpuflow provides the TPU-native equivalents —
Perfetto/TensorBoard traces via ``jax.profiler`` and
``block_until_ready``-bracketed steps/sec counters feeding the
north-star metric (BASELINE.json rollout steps/sec/chip).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_context(trace_dir: str | None):
    """Capture a jax.profiler trace into ``trace_dir`` (no-op if None).
    View with TensorBoard or ui.perfetto.dev."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def step_timer(result: dict, key: str, n_items: int = 1):
    """Time a block with device sync; writes items/sec into result[key]
    and seconds into result[key + "_seconds"].

    The block receives a one-slot list; put the output array/pytree in
    it and the timer blocks on it before stopping the clock (required
    for honest TPU timings — dispatch is async)::

        with step_timer(out, "steps_per_sec", n) as sync:
            y = f(x)
            sync.append(y)
    """
    sync: list = []
    t0 = time.perf_counter()
    yield sync
    if sync:
        # Materialize one element to the host rather than
        # block_until_ready: the latter has been observed returning
        # early through tunneled TPU backends, but bytes cannot arrive
        # before the computation finishes.
        import numpy as np

        leaf = jax.tree.leaves(sync[-1])[0]
        # Slice ONE element device-side first so the host transfer is
        # O(1) bytes, not the whole result.
        np.asarray(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)
    dt = time.perf_counter() - t0
    result[key] = n_items / dt if dt > 0 else float("inf")
    result[f"{key}_seconds"] = dt
