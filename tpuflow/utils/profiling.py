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


def force_completion(tree) -> None:
    """Force TRUE completion of a device computation by host-fetching
    one element of EVERY leaf (O(n_leaves) bytes).

    Use this — never ``jax.block_until_ready`` — before starting any
    timed region: block_until_ready has been observed returning early
    through tunneled TPU backends, which silently shifts the async
    compile/execution into the timing (a 111 steps/s rollout once
    "measured" 0.2 steps/s this way). Bytes cannot arrive before the
    computation finishes, so the 1-element transfer is a real barrier.

    Every leaf is fetched, not just the first: a pytree combining the
    outputs of several sequentially dispatched executables is only
    complete when the LAST one finishes — syncing one leaf would stop
    the clock while later dispatches still run and silently inflate
    the measured rate.
    """
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)


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
        force_completion(sync[-1])
    dt = time.perf_counter() - t0
    result[key] = n_items / dt if dt > 0 else float("inf")
    result[f"{key}_seconds"] = dt
