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
import os
import subprocess
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

# Hard watchdog: the tunneled TPU client has been observed to HANG at
# init (not error) when the tunnel is wedged; a benchmark that never
# returns is worse than one that fails loudly. 25 min >> the ~40 s
# compile + seconds of timed runs this script actually needs.
_WATCHDOG_S = 1500


def _watchdog():
    time.sleep(_WATCHDOG_S)
    print(
        f"# bench watchdog: no result after {_WATCHDOG_S}s — TPU tunnel "
        "likely wedged; aborting without emitting a misleading metric",
        file=sys.stderr,
        flush=True,
    )
    os._exit(70)


ROLLOUT_STEPS = 100
N_SAMPLES = 64
CPU_STEPS = 8  # steady-state CPU denominator run (steps/sec is rate-based)


def _make_rollout(use_pallas: bool):
    """Rollout closure for the flagship config; params are shared
    between the pallas and XLA variants (use_pallas only reroutes the
    coupling apply)."""
    from tpuflow.configs.config import load_case
    from tpuflow.eval.rollout import make_ensemble_rollout
    from tpuflow.models import TMGlow

    cfg = load_case(
        "backward-step",
        {
            "model.use_pallas": use_pallas,
            "eval.n_samples": N_SAMPLES,
            "eval.rollout_steps": ROLLOUT_STEPS,
        },
    )
    model = TMGlow(cfg.model)
    return cfg, make_ensemble_rollout(
        model, N_SAMPLES, temperature=0.7, collect="stats"
    )


def _build(use_pallas: bool):
    from tpuflow.data import generate_case
    from tpuflow.models import TMGlow, init_lstm_state

    cfg, rollout = _make_rollout(use_pallas)
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
    return cfg, variables, rollout, lf_traj_np


def _materialize(out) -> None:
    """Force TRUE completion before/after a timed region (shared
    helper; see its docstring for the tunneled-backend rationale)."""
    from tpuflow.utils.profiling import force_completion

    force_completion(out)


def _time_rollout(rollout, variables, lf_traj, steps: int, repeats: int = 5) -> float:
    """Median steady-state steps/sec over ``repeats`` timed runs."""
    fn = jax.jit(rollout)
    lf = jnp.asarray(lf_traj[:steps])
    _materialize(fn(variables, lf, jax.random.PRNGKey(0)))  # compile + warm
    rates = []
    for i in range(repeats):
        t0 = time.perf_counter()
        _materialize(fn(variables, lf, jax.random.PRNGKey(1 + i)))
        rates.append(steps / (time.perf_counter() - t0))
    _log(f"rates: {[round(r, 2) for r in rates]}")
    return sorted(rates)[len(rates) // 2]


def _log(msg: str) -> None:
    if "--quiet" not in sys.argv:
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _accelerator_reachable() -> bool:
    """Bounded subprocess probe of the default (accelerator) backend.

    The tunneled TPU client HANGS at init (does not error) when the
    tunnel is wedged, so the probe must live in a child process we can
    kill. Probing before this process touches any backend lets us fall
    back to CPU and still emit the one JSON line the driver records,
    instead of tripping the watchdog with no output at all.
    """
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=110,
            capture_output=True,
        )
        return proc.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def main() -> None:
    threading.Thread(target=_watchdog, daemon=True).start()
    fallback = False
    plat = os.environ.get("TPUFLOW_PLATFORM")
    if plat:
        # Same contract as the CLI entry points (tpuflow/cli/__init__.py):
        # JAX_PLATFORMS alone cannot override the force-registered plugin.
        jax.config.update("jax_platforms", plat)
    elif not _accelerator_reachable():
        _log(
            "accelerator probe failed/hung (tunnel wedged?) — falling back "
            "to CPU so a result line is still emitted"
        )
        jax.config.update("jax_platforms", "cpu")
        fallback = True
    on_tpu = jax.default_backend() == "tpu"
    _log("building model (init)...")
    # XLA coupling path on both sides — measured faster than the Pallas
    # custom call for this workload (see ModelConfig.use_pallas).
    cfg, variables, rollout, lf_traj = _build(use_pallas=False)
    _log("timing device rollout (compile + timed runs)...")

    # On CPU (no accelerator) the 100-step x 6-run protocol would take
    # hours and trip the watchdog; the metric is a steady-state rate, so
    # a short run measures the same quantity.
    if on_tpu:
        value = _time_rollout(rollout, variables, lf_traj, ROLLOUT_STEPS)
    else:
        value = _time_rollout(rollout, variables, lf_traj, CPU_STEPS, repeats=1)
    _log(f"device rate: {value:.2f} steps/s; timing CPU denominator...")

    # CPU denominator: identical model/ensemble on the host CPU (XLA
    # coupling path — Pallas kernels don't lower to the CPU backend).
    if not on_tpu:
        cpu_rate = value
    else:
        _, rollout_xla = _make_rollout(use_pallas=False)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables_cpu = jax.device_put(variables, cpu)
            cpu_rate = _time_rollout(
                rollout_xla, variables_cpu, lf_traj, CPU_STEPS, repeats=1
            )
        _log(f"cpu rate: {cpu_rate:.3f} steps/s")

    print(
        json.dumps(
            {
                "metric": "rollout_steps_per_sec_chip_bstep64",
                "value": round(value, 3),
                "unit": "steps/s (100-step, 64-sample ensemble, backward-step)"
                + (" [CPU FALLBACK: accelerator unreachable]" if fallback else ""),
                "vs_baseline": round(value / cpu_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
