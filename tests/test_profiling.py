"""Profiling helper tests (SURVEY.md §5 tracing/profiling parity+):
trace capture produces an on-disk profile, force_completion is a real
barrier over whole pytrees, and step_timer reports honest rates."""

import jax
import jax.numpy as jnp

from tpuflow.utils.profiling import force_completion, step_timer, trace_context


def test_trace_context_writes_profile(tmp_path):
    d = tmp_path / "trace"
    with trace_context(str(d)):
        jnp.square(jnp.arange(8.0)).block_until_ready()
    files = list(d.rglob("*"))
    assert any(f.is_file() for f in files), "no profile artifacts written"


def test_trace_context_none_is_noop(tmp_path):
    with trace_context(None):
        pass
    with trace_context(""):
        pass


def test_force_completion_handles_pytrees():
    tree = {
        "a": jnp.ones((4, 4)),
        "b": (jnp.zeros(3), jnp.float32(2.0)),
        "c": [jnp.arange(5)],
    }
    force_completion(tree)  # must not raise on arrays or scalars
    force_completion(jnp.ones(()))  # 0-d array leaf


def test_step_timer_reports_rate_and_seconds():
    out: dict = {}
    x = jnp.ones((32, 32))
    f = jax.jit(lambda a: a @ a)
    f(x)  # warm up so the timed region is execution only
    with step_timer(out, "steps_per_sec", n_items=10) as sync:
        y = f(x)
        sync.append(y)
    assert out["steps_per_sec"] > 0
    assert out["steps_per_sec_seconds"] > 0
    assert abs(out["steps_per_sec"] * out["steps_per_sec_seconds"] - 10) < 1e-6


def test_step_timer_empty_sync_still_times():
    out: dict = {}
    with step_timer(out, "rate"):
        pass
    assert "rate" in out and "rate_seconds" in out
