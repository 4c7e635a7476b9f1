"""Regenerate the committed evaluator regression oracle.

VERDICT r4 weak #3 / item 6: the r4 evaluate-refactor's equivalence
proof lived in a gitignored scratch file (``.verify_eval_oracle.py``)
that does not exist in the tree — the central "byte-identical" claim
in ``eval/metrics.py`` cited evidence nobody could re-run. This tool
replaces it with a COMMITTED oracle: a small-but-complete evaluation
of a committed checkpoint (every metric family, every calibration
chain, holdout scoring) whose ``eval_metrics.json`` is checked into
``runs/r5_eval_oracle/`` and re-derived by
``tests/test_eval_oracle.py`` with the current evaluator on every
full-suite run. Any change to metric definitions, calibration fits,
or eval plumbing that shifts a number now fails a committed test
instead of a deleted scratch diff.

The oracle runs on the CPU backend with the same 8-virtual-device
environment as the test suite (tests/conftest.py) so the committed
numbers are reproducible on any host:

    python -m tpuflow.tools.make_eval_oracle

Size knobs are deliberately tiny (8 members, 16 steps) — the oracle
pins CODE behavior, not model quality; the converged-run pins in
tests/test_converged.py cover quality.
"""

from __future__ import annotations

import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[2]

# The full argument list IS the oracle's identity — the regression
# test imports it so the committed artifact and the re-derivation can
# never drift apart silently.
ORACLE_CASE = "backward-step"
ORACLE_OUTPUT = "runs/r5_eval_oracle"
ORACLE_OVERRIDES = [
    "data.fixture_version=2",
    f"train.checkpoint_dir={REPO / 'runs/r4_bstep_deeper/checkpoints'}",
    # As small as the evaluator allows while still exercising every
    # metric family: the first cut (8 members / 16 steps) cost a
    # 37-minute test on the 1-core host; this one halves every axis.
    "eval.n_samples=4",
    "eval.rollout_steps=8",
    "eval.calibration_steps=6",
    "eval.ref_steps=16",
    "eval.traj_batch=2",
]


def oracle_args(output_dir: str | os.PathLike) -> list[str]:
    return [
        ORACLE_CASE,
        *ORACLE_OVERRIDES,
        f"eval.output_dir={output_dir}",
    ]


def _force_cpu_testenv() -> None:
    """Mirror tests/conftest.py: CPU backend, 8 virtual devices.

    The environment registers a TPU PJRT plugin from sitecustomize and
    force-selects it via jax.config, so JAX_PLATFORMS alone does not
    override it — the config update below does (conftest.py note).
    """
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()


def main(argv=None) -> dict:
    _force_cpu_testenv()
    from tpuflow.cli.evaluate import main as evaluate_main

    out = REPO / ORACLE_OUTPUT
    metrics = evaluate_main(oracle_args(out))
    print(f"oracle written under {out}")
    return metrics


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
