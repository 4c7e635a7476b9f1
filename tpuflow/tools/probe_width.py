"""Coupling-width perf costing probe (r3 VERDICT "weak" item 4).

The measured ~125 steps/s rollout bound is a property of the
``[CHOSEN]`` C=64 coupling width half-filling the MXU's 128-wide rows
(docs/PERF_NOTES.md). This probe costs the perf side of the C=128
co-design point that was never measured: build the flagship ensemble
rollout at coupling_width in {64, 128} (same case preset otherwise),
time it on the default backend, and print one JSON line per width.

The QUALITY side of the co-design (does a 128-wide coupling net buy
NLL/skill?) needs a converged training run per width — out of scope
for a probe; this tool answers whether the wider net rides the MXU
for free (rate ratio ~1.0 → width is perf-free, take the capacity) or
costs real throughput (ratio << 1 → the C=64 choice is also a perf
choice).

Usage:
  python -m tpuflow.tools.probe_width [case] [steps=60] [widths=64,128] \
      [tau=0.7]

The sampling temperature is traced (zero perf impact) but recorded in
every emitted row so the measured graph is fully specified.

Parity: SURVEY.md §5 tracing/profiling row (perf tooling family).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROLLOUT_STEPS = 60
N_SAMPLES = 64
WINDOW = 4


def _materialize(out) -> None:
    from tpuflow.utils.profiling import force_completion

    force_completion(out)


def _median_rate(fn, args, n_units: int, repeats: int = 3) -> float:
    """Median steady-state units/sec; compile+warm excluded."""
    _materialize(fn(*args))
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _materialize(fn(*args))
        rates.append(n_units / (time.perf_counter() - t0))
    return sorted(rates)[len(rates) // 2]


def probe(
    case: str,
    width: int,
    steps: int,
    n_samples: int = N_SAMPLES,
    overrides: dict | None = None,
    tau: float = 0.7,
) -> dict:
    from tpuflow.configs.config import load_case
    from tpuflow.data import generate_case
    from tpuflow.eval.rollout import make_ensemble_rollout
    from tpuflow.models import TMGlow, init_lstm_state

    # eval.n_samples / eval.rollout_steps are written into cfg AND
    # consumed from it below — one source of truth (r4 advisor).
    cfg = load_case(
        case,
        {
            **(overrides or {}),
            "model.coupling_width": width,
            "eval.n_samples": n_samples,
            "eval.rollout_steps": steps,
        },
    )
    steps = cfg.eval.rollout_steps
    n_samples = cfg.eval.n_samples
    model = TMGlow(cfg.model)
    lf, hf = generate_case(
        case, 1, max(steps, WINDOW + 1), cfg.model.hf_shape,
        cfg.model.lf_shape, seed=0,
        fixture_version=cfg.data.fixture_version,
    )
    state = init_lstm_state(cfg.model, (1,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]), state
    )
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"])
    )

    rollout = jax.jit(
        make_ensemble_rollout(model, n_samples, temperature=tau, collect="stats")
    )
    lf_traj = jnp.asarray(lf[0, :steps])
    rollout_rate = _median_rate(
        rollout, (variables, lf_traj, jax.random.PRNGKey(1)), steps
    )

    return {
        "case": case,
        "coupling_width": width,
        "n_params": n_params,
        "rollout_steps_per_sec": round(rollout_rate, 3),
        "rollout_steps": steps,
        "n_samples": n_samples,
        "temperature": tau,
        "backend": jax.default_backend(),
    }


def main(argv=None) -> list[dict]:
    argv = list(sys.argv[1:] if argv is None else argv)
    case = argv[0] if argv and "=" not in argv[0] else "backward-step"
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    steps = int(kv.get("steps", ROLLOUT_STEPS))
    samples = int(kv.get("samples", N_SAMPLES))
    widths = [int(w) for w in kv.get("widths", "64,128").split(",")]
    tau = float(kv.get("tau", 0.7))
    # Anything else (dotted config paths) passes through to load_case —
    # same convention as the other probes, and what lets the unit test
    # run this on a tiny model. Echo the resolved case up front so a
    # mistyped positional arg (which would silently fall back to
    # backward-step) is visible before a long probe run (r4 advisor).
    overrides = {
        k: v
        for k, v in kv.items()
        if k not in ("steps", "samples", "widths", "tau")
    }
    print(
        json.dumps({"probing_case": case, "widths": widths, "tau": tau}),
        flush=True,
    )
    rows = []
    for w in widths:
        row = probe(case, w, steps, samples, overrides, tau=tau)
        rows.append(row)
        print(json.dumps(row), flush=True)
    if len(rows) >= 2:
        base = rows[0]["rollout_steps_per_sec"]
        for row in rows[1:]:
            ratio = row["rollout_steps_per_sec"] / base if base else float("nan")
            print(
                json.dumps(
                    {
                        "rate_ratio_vs_first": round(ratio, 3),
                        "coupling_width": row["coupling_width"],
                        "param_ratio_vs_first": round(
                            row["n_params"] / rows[0]["n_params"], 3
                        ),
                    }
                ),
                flush=True,
            )
    return rows


if __name__ == "__main__":
    main()
