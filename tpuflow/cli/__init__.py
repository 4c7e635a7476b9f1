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


def parse_args(argv: list[str] | None = None, prog: str = "tpuflow") -> CaseConfig:
    _apply_platform_env()
    argv = sys.argv[1:] if argv is None else argv
    if not argv or "-h" in argv or "--help" in argv:
        from tpuflow.configs.config import case_names

        print(__doc__)
        print("known cases:", ", ".join(case_names()))
        raise SystemExit(0)
    case, overrides = argv[0], parse_cli_overrides(argv[1:])
    return load_case(case, overrides)
