"""North-star benchmark: rollout steps/sec/chip.

BASELINE.json primary metric: 100-step, 64-sample ensemble rollout of
the backward-step case on one TPU chip; `vs_baseline` is the measured
speedup over CPU-reference throughput for the identical model
(BASELINE.md measurement plan: the denominator is measured, not looked
up — steady-state steps/sec from a shorter CPU run of the same
compiled step).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


ROLLOUT_STEPS = 100
N_SAMPLES = 64
CPU_STEPS = 8  # steady-state CPU denominator run (steps/sec is rate-based)


def _build():
    from tpuflow.configs.config import load_case
    from tpuflow.data import generate_case
    from tpuflow.eval.rollout import make_ensemble_rollout
    from tpuflow.models import TMGlow, init_lstm_state

    on_tpu = jax.default_backend() == "tpu"
    cfg = load_case(
        "backward-step",
        {
            "model.use_pallas": on_tpu,
            "eval.n_samples": N_SAMPLES,
            "eval.rollout_steps": ROLLOUT_STEPS,
        },
    )
    model = TMGlow(cfg.model)
    lf, hf = generate_case(
        "backward-step", 1, 2, cfg.model.hf_shape, cfg.model.lf_shape, seed=0
    )
    state = init_lstm_state(cfg.model, (1,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]), state
    )
    lf_traj_np = np.concatenate(
        [generate_case("backward-step", 1, 64, cfg.model.hf_shape,
                       cfg.model.lf_shape, seed=1)[0][0]] * 2
    )[:ROLLOUT_STEPS]
    rollout = make_ensemble_rollout(
        model, N_SAMPLES, temperature=0.7, collect="stats"
    )
    return cfg, variables, rollout, lf_traj_np


def _time_rollout(rollout, variables, lf_traj, steps: int) -> float:
    fn = jax.jit(rollout)
    lf = jnp.asarray(lf_traj[:steps])
    out = fn(variables, lf, jax.random.PRNGKey(0))
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    out = fn(variables, lf, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return steps / dt


def main() -> None:
    cfg, variables, rollout, lf_traj = _build()

    value = _time_rollout(rollout, variables, lf_traj, ROLLOUT_STEPS)

    # CPU denominator: identical model/ensemble on the host CPU.
    if jax.default_backend() == "cpu":
        cpu_rate = value
    else:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables_cpu = jax.device_put(variables, cpu)
            cpu_rate = _time_rollout(rollout, variables_cpu, lf_traj, CPU_STEPS)

    print(
        json.dumps(
            {
                "metric": "rollout_steps_per_sec_chip_bstep64",
                "value": round(value, 3),
                "unit": "steps/s (100-step, 64-sample ensemble, backward-step)",
                "vs_baseline": round(value / cpu_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
