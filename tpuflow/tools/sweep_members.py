"""Rollout throughput vs ensemble width N (lane-packing study).

The ensemble axis is the conv batch axis during rollout, and the v5e
trace of the production config showed XLA choosing a batch-minor conv
layout — at N=64 that half-fills the 128 vector lanes, so widening the
ensemble toward a lane multiple may cost far less than linearly
(member-steps/s is the efficiency readout). This tool measures
steady-state rollout rate over a grid of N on whatever backend is
active, printing one JSON row per width.

Throughput only: parameters are randomly initialised (same FLOPs as a
trained checkpoint) and the LF input is the synthetic fixture, so no
dataset or checkpoint is needed. Run with an idle chip — a concurrent
trainer both skews the numbers and risks wedging a tunneled client
(docs/OPERATIONS.md).

Usage:
  python -m tpuflow.tools.sweep_members <case> \
      [members=32,64,96,128] [steps=100] [repeats=3] [key=value ...]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


from tpuflow.utils.profiling import force_completion as _materialize


def sweep(cfg, members, steps: int, repeats: int = 3) -> list[dict]:
    """Median steady-state rollout rates for each ensemble width."""
    from tpuflow.data import generate_case
    from tpuflow.eval.rollout import make_ensemble_rollout
    from tpuflow.models import TMGlow, init_lstm_state

    model = TMGlow(cfg.model)
    lf, hf = generate_case(
        cfg.name, 1, 2, cfg.model.hf_shape, cfg.model.lf_shape, seed=0
    )
    state = init_lstm_state(cfg.model, (1,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]), state
    )
    n_fixture = max(2, min(64, steps))
    traj = np.concatenate(
        [
            generate_case(
                cfg.name, 1, n_fixture, cfg.model.hf_shape, cfg.model.lf_shape, seed=1
            )[0][0]
        ]
        * (1 + (steps - 1) // n_fixture)
    )[:steps]
    lf_traj = jnp.asarray(traj)

    rows = []
    for n in members:
        # stats-mode rollout (the production UQ path) requires N >= 2 by
        # contract (variance over one member is identically zero); the
        # supported single-sample path is collect="fields", so the N=1
        # leg of the sweep measures that instead.
        collect = "stats" if n >= 2 else "fields"
        fn = jax.jit(
            make_ensemble_rollout(
                model, int(n), temperature=0.7, collect=collect
            )
        )
        _materialize(fn(variables, lf_traj, jax.random.PRNGKey(0)))  # compile+warm
        rates = []
        for i in range(repeats):
            t0 = time.perf_counter()
            _materialize(fn(variables, lf_traj, jax.random.PRNGKey(1 + i)))
            rates.append(steps / (time.perf_counter() - t0))
        rate = sorted(rates)[len(rates) // 2]
        row = {
            "members": int(n),
            "steps_per_sec": round(rate, 3),
            "member_steps_per_sec": round(rate * n, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main(argv=None) -> list[dict]:
    from tpuflow.cli import parse_args

    argv = list(sys.argv[1:] if argv is None else argv)
    members, steps, repeats = (32, 64, 96, 128), 100, 3
    for a in list(argv):
        if a.startswith("members="):
            members = tuple(int(x) for x in a.split("=", 1)[1].split(","))
            argv.remove(a)
        elif a.startswith("steps="):
            steps = int(a.split("=", 1)[1])
            argv.remove(a)
        elif a.startswith("repeats="):
            repeats = int(a.split("=", 1)[1])
            argv.remove(a)
    cfg = parse_args(argv)
    rows = sweep(cfg, members, steps, repeats)
    out_dir = pathlib.Path(cfg.eval.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "members_sweep.json").write_text(json.dumps(rows, indent=2))
    return rows


from tpuflow.cli import as_console_script

cli = as_console_script(main)


if __name__ == "__main__":
    main()
