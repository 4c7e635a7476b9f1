"""North-star benchmark: rollout steps/sec/chip + train NLL it/sec.

BASELINE.json's metric names TWO numbers: the 100-step 64-sample
backward-step ensemble rollout (steps/sec/chip, primary) and train NLL
iterations/sec. This script emits both, plus the cylinder-array
mini-ensemble rollout (BASELINE config #2) and an on-chip compiled
(non-interpret) Pallas coupling-kernel parity + microbench record
(VERDICT r1 items 2, 7, 8). `vs_baseline` is the measured speedup over
CPU-reference throughput for the identical model (BASELINE.md
measurement plan; median of 3 CPU runs).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Sections run most-important-first and fail soft: if the TPU tunnel
wedges mid-run, the watchdog prints the JSON line with whatever
sections completed instead of dying silently.
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
# returns is worse than one that fails loudly. Sized for four
# server-side compiles (~10 min each worst case) + timed runs.
_WATCHDOG_S = 3300

ROLLOUT_STEPS = 100
N_SAMPLES = 64
CPU_STEPS = 8  # steady-state CPU denominator run (steps/sec is rate-based)

# Filled section by section; the watchdog emits it on timeout so a
# mid-run wedge still reports every completed section.
RESULT: dict = {}
_EMITTED = threading.Event()


def _emit() -> None:
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    print(json.dumps(RESULT), flush=True)


def _watchdog():
    time.sleep(_WATCHDOG_S)
    print(
        f"# bench watchdog: no completion after {_WATCHDOG_S}s — TPU "
        "tunnel likely wedged; emitting partial results",
        file=sys.stderr,
        flush=True,
    )
    if "value" not in RESULT:
        RESULT.setdefault("metric", "rollout_steps_per_sec_chip_bstep64")
        RESULT.setdefault("value", None)
        RESULT.setdefault(
            "unit", "steps/s [WATCHDOG: primary section never completed]"
        )
        RESULT.setdefault("vs_baseline", None)
    _emit()
    os._exit(70)


def _make_rollout(case: str, n_samples: int, use_pallas: bool = False):
    """Rollout closure for a case preset; params are shared between the
    pallas and XLA variants (use_pallas only reroutes the coupling
    apply)."""
    from tpuflow.configs.config import load_case
    from tpuflow.eval.rollout import make_ensemble_rollout
    from tpuflow.models import TMGlow

    cfg = load_case(
        case,
        {
            "model.use_pallas": use_pallas,
            "eval.n_samples": n_samples,
            "eval.rollout_steps": ROLLOUT_STEPS,
        },
    )
    model = TMGlow(cfg.model)
    return cfg, make_ensemble_rollout(
        model, n_samples, temperature=0.7, collect="stats"
    )


def _build(case: str = "backward-step", n_samples: int = N_SAMPLES):
    from tpuflow.data import generate_case
    from tpuflow.models import TMGlow, init_lstm_state

    cfg, rollout = _make_rollout(case, n_samples)
    model = TMGlow(cfg.model)
    lf, hf = generate_case(
        case, 1, 2, cfg.model.hf_shape, cfg.model.lf_shape, seed=0
    )
    state = init_lstm_state(cfg.model, (1,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]), state
    )
    lf_traj_np = np.concatenate(
        [generate_case(case, 1, 64, cfg.model.hf_shape,
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


def _bench_train() -> float:
    """Fused trajectory train step at the flagship config: optimizer
    updates (BPTT windows) per second — BASELINE.json's 'train NLL
    it/sec' (one iteration = one windowed NLL + backprop + Adam
    update over the batch)."""
    from tpuflow.configs.config import load_case
    from tpuflow.data import generate_case
    from tpuflow.models import TMGlow, init_lstm_state
    from tpuflow.train.step import make_optimizer, make_trajectory_train_step

    cfg = load_case("backward-step")
    model = TMGlow(cfg.model)
    b, t, w = cfg.data.batch_size, cfg.data.train_steps, cfg.data.window
    lf, hf = generate_case(
        "backward-step", b, t, cfg.model.hf_shape, cfg.model.lf_shape, seed=2
    )
    state = init_lstm_state(cfg.model, (b,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]),
        state,
    )
    params, buffers = variables["params"], variables["buffers"]
    opt = make_optimizer(
        cfg.train.lr, cfg.train.lr_decay, cfg.train.grad_clip,
        cfg.train.weight_decay,
    )
    opt_state = opt.init(params)
    step = jax.jit(
        make_trajectory_train_step(model, opt, w, remat=cfg.train.remat)
    )
    lf_d, hf_d = jnp.asarray(lf), jnp.asarray(hf)
    n_win = t // w
    params, opt_state, m = step(params, buffers, opt_state, lf_d, hf_d)
    _materialize(m["bpd"])  # compile + warm
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, m = step(params, buffers, opt_state, lf_d, hf_d)
        _materialize(m["bpd"])
        rates.append(n_win / (time.perf_counter() - t0))
    _log(f"train rates (windows/s): {[round(r, 2) for r in rates]}")
    return sorted(rates)[len(rates) // 2]


def _bench_pallas_parity() -> dict:
    """Compiled (non-interpret) Pallas coupling kernel ON THE CHIP:
    parity vs the XLA path in both directions at the flagship coupling
    shape, plus a fused-op microbench (VERDICT r1 item 7)."""
    from tpuflow.kernels.coupling_ops import _xla_coupling_apply
    from tpuflow.kernels.coupling_pallas import pallas_coupling_apply

    # Flagship scale-0 coupling shape: 64 members, 32x64 field, 6 chans.
    shape = (N_SAMPLES, 32, 64, 6)
    k = jax.random.PRNGKey(0)
    kx, kr, kt = jax.random.split(k, 3)
    x = jax.random.normal(kx, shape, jnp.float32)
    raw = jax.random.normal(kr, shape, jnp.float32) * 0.5
    t = jax.random.normal(kt, shape, jnp.float32) * 0.5

    out: dict = {}
    fns = {}
    for rev in (False, True):
        pal = jax.jit(lambda a, b, c, rev=rev: pallas_coupling_apply(
            a, b, c, reverse=rev))
        xla = jax.jit(lambda a, b, c, rev=rev: _xla_coupling_apply(
            a, b, c, reverse=rev))
        yp, ldp = pal(x, raw, t)
        yx, ldx = xla(x, raw, t)
        _materialize((yp, yx))
        key = "inv" if rev else "fwd"
        out[f"max_abs_err_{key}"] = float(
            max(jnp.max(jnp.abs(yp - yx)), jnp.max(jnp.abs(ldp - ldx)))
        )
        fns[key] = (pal, xla)

    def _rate(fn) -> float:
        n = 50
        _materialize(fn(x, raw, t))
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(x, raw, t)
        _materialize(r)
        gb = 5 * x.size * 4 / 1e9  # 3 reads + ~2 writes per call
        return n * gb / (time.perf_counter() - t0)

    out["pallas_fwd_gbps"] = round(_rate(fns["fwd"][0]), 1)
    out["xla_fwd_gbps"] = round(_rate(fns["fwd"][1]), 1)
    return out


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
    cfg, variables, rollout, lf_traj = _build()
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
    # Median of 3 runs (a one-sample denominator in the headline metric
    # was VERDICT r1 weak-item 4).
    if not on_tpu:
        cpu_rate = value
    else:
        _, rollout_xla = _make_rollout("backward-step", N_SAMPLES)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables_cpu = jax.device_put(variables, cpu)
            cpu_rate = _time_rollout(
                rollout_xla, variables_cpu, lf_traj, CPU_STEPS, repeats=3
            )
        _log(f"cpu rate: {cpu_rate:.3f} steps/s")

    RESULT.update(
        {
            "metric": "rollout_steps_per_sec_chip_bstep64",
            "value": round(value, 3),
            "unit": "steps/s (100-step, 64-sample ensemble, backward-step)"
            + (" [CPU FALLBACK: accelerator unreachable]" if fallback else ""),
            "vs_baseline": round(value / cpu_rate, 2),
        }
    )

    # --- Secondary sections (fail soft; watchdog emits partials). ---
    try:
        _log("timing fused train step (train NLL it/sec)...")
        if on_tpu:
            RESULT["train_windows_per_sec"] = round(_bench_train(), 3)
        else:
            _log("skipping train bench on CPU (compile+run too slow)")
    except Exception as e:  # noqa: BLE001 — report, don't die
        _log(f"train bench failed: {e!r}")
        RESULT["train_windows_per_sec"] = None

    try:
        _log("timing cylinder-array mini-ensemble rollout (config #2)...")
        if on_tpu:
            _, cyl_vars, cyl_rollout, cyl_lf = _build("cylinder-array", 4)
            RESULT["cylinder_steps_per_sec"] = round(
                _time_rollout(cyl_rollout, cyl_vars, cyl_lf, ROLLOUT_STEPS,
                              repeats=3), 3,
            )
        else:
            _log("skipping cylinder bench on CPU")
    except Exception as e:  # noqa: BLE001
        _log(f"cylinder bench failed: {e!r}")
        RESULT["cylinder_steps_per_sec"] = None

    try:
        if on_tpu:
            _log("pallas on-chip parity + microbench...")
            RESULT["pallas"] = _bench_pallas_parity()
    except Exception as e:  # noqa: BLE001
        _log(f"pallas parity failed: {e!r}")
        RESULT["pallas"] = None

    _emit()


if __name__ == "__main__":
    sys.exit(main())
