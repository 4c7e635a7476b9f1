"""Committed evaluator regression oracle (VERDICT r4 weak #3 / item 6).

Re-derives the committed ``runs/r5_eval_oracle`` evaluation with the
CURRENT evaluator (same checkpoint, same knobs — the argument list is
imported from tools/make_eval_oracle so the two can't drift) and
diffs ``eval_metrics.json``: tolerance-zero on the key set, tight
float tolerance on every value. This is the committed replacement for
the gitignored ``.verify_eval_oracle.py`` scratch the r4 refactor
cited: any change to metric definitions, calibration fits, holdout
scoring, or eval plumbing that shifts a number fails HERE, with the
offending key named.

Regenerate intentionally with ``python -m tpuflow.tools.make_eval_oracle``
(and commit the diff with the code change that motivated it).
"""

from __future__ import annotations

import json
import math
import pathlib

import pytest

from tpuflow.tools.make_eval_oracle import ORACLE_CASE, REPO, oracle_args

ORACLE_METRICS = (
    REPO / "runs" / "r5_eval_oracle" / ORACLE_CASE / "eval_metrics.json"
)

# Same-backend re-derivation: identical inputs through identical jitted
# graphs. XLA CPU reductions are deterministic in practice but not
# contractually bit-stable across XLA releases, so the values get a
# tight-but-nonzero tolerance; the KEY SET gets none.
RTOL = 1e-4
ATOL = 1e-6


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        elif isinstance(v, list):
            for i, x in enumerate(v):
                out[f"{key}[{i}]"] = x
        else:
            out[key] = v
    return out


@pytest.mark.slow
def test_evaluator_matches_committed_oracle(tmp_path):
    if not ORACLE_METRICS.exists():
        pytest.fail(
            f"{ORACLE_METRICS} missing — the committed oracle is part of "
            "the repository contract; regenerate with "
            "python -m tpuflow.tools.make_eval_oracle"
        )
    committed = _flatten(json.loads(ORACLE_METRICS.read_text()))

    from tpuflow.cli.evaluate import main as evaluate_main

    evaluate_main(oracle_args(tmp_path))
    fresh_path = tmp_path / ORACLE_CASE / "eval_metrics.json"
    fresh = _flatten(json.loads(fresh_path.read_text()))

    assert set(fresh) == set(committed), (
        "eval_metrics.json key set drifted: "
        f"+{sorted(set(fresh) - set(committed))} "
        f"-{sorted(set(committed) - set(fresh))}"
    )
    bad = []
    for k, want in committed.items():
        got = fresh[k]
        if isinstance(want, (int, float)) and isinstance(got, (int, float)):
            if math.isnan(want) and math.isnan(got):
                continue
            if abs(got - want) > ATOL + RTOL * abs(want):
                bad.append((k, want, got))
        elif got != want:
            bad.append((k, want, got))
    assert not bad, f"{len(bad)} metric(s) drifted from the oracle: {bad[:10]}"
