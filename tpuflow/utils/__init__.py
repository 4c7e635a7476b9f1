"""Utilities: structured metrics logging and profiling helpers
(SURVEY.md §5 tracing/observability rows)."""

from tpuflow.utils.logging import MetricsLogger
from tpuflow.utils.profiling import step_timer, trace_context

__all__ = ["MetricsLogger", "step_timer", "trace_context"]
