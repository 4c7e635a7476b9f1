"""CLI entry points — the case API of the reference preserved:

    python -m tpuflow.cli.train    <case> [key=value ...]
    python -m tpuflow.cli.rollout  <case> [key=value ...]
    python -m tpuflow.cli.evaluate <case> [key=value ...]

One positional argument selects the case end-to-end (backward-step /
cylinder-array — BASELINE.json configs; SURVEY.md §5 config row);
trailing ``key=value`` pairs override any config field (dotted paths,
e.g. ``model.n_scales=2 train.epochs=5``).
"""

from __future__ import annotations

import os
import sys

from tpuflow.configs.config import CaseConfig, load_case, parse_cli_overrides


def _apply_platform_env() -> None:
    """Honour TPUFLOW_PLATFORM=cpu|tpu. The JAX_PLATFORMS env var alone
    cannot override this machine's force-registered TPU plugin (see
    tests/conftest.py); jax.config.update can."""
    plat = os.environ.get("TPUFLOW_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache for every CLI entry point.

    The fused trajectory train step compiles in minutes at production
    size (outer scan over BPTT windows x inner scan over time, with
    gradients); on standard TPU hosts the persistent cache makes
    resume / re-eval / sweep restarts pay that once per (config,
    jaxlib) instead of once per process. Honest measurement note: on
    THIS dev box (tunneled axon backend, remote compile helper) no
    speedup was measurable — startup varied 410-871 s run-to-run with
    the cache both on and off, so treat it as standard-practice
    plumbing, not a local win. Opt out with TPUFLOW_COMPILE_CACHE=off
    or point it elsewhere with TPUFLOW_COMPILE_CACHE=<dir>."""
    knob = os.environ.get("TPUFLOW_COMPILE_CACHE", "")
    if knob.lower() == "off":
        return
    import pathlib

    cache_dir = knob or str(
        pathlib.Path(os.environ.get("XDG_CACHE_HOME",
                                    pathlib.Path.home() / ".cache"))
        / "tpuflow" / "xla"
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def as_console_script(main_fn):
    """Wrap a ``main()`` whose return value is data (metrics dict,
    sweep rows, an output path) into a ``[project.scripts]`` target.

    setuptools console scripts run ``sys.exit(target())``, so a truthy
    return value would be printed to stderr and turn a successful run
    into exit code 1. Every data-returning main must go through this
    (``tests/test_cli.py::test_console_scripts_resolve`` enforces it).
    """
    import functools

    @functools.wraps(main_fn)
    def cli() -> int:
        main_fn()
        return 0

    cli.__tpuflow_console_script__ = True
    return cli


def parse_args(argv: list[str] | None = None, prog: str = "tpuflow") -> CaseConfig:
    _apply_platform_env()
    _enable_compilation_cache()
    argv = sys.argv[1:] if argv is None else argv
    if not argv or "-h" in argv or "--help" in argv:
        from tpuflow.configs.config import case_names

        print(__doc__)
        print("known cases:", ", ".join(case_names()))
        # Missing case argument is a usage ERROR (exit 2), not success:
        # scripts checking the exit code must not conclude a run
        # happened (e.g. `tpuflow-train $CASE` with $CASE empty).
        raise SystemExit(0 if argv else 2)
    case, overrides = argv[0], parse_cli_overrides(argv[1:])
    return load_case(case, overrides)
