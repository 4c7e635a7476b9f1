"""North-star benchmark: rollout steps/sec/chip + train NLL it/sec.

BASELINE.json's metric names TWO numbers: the 100-step 64-sample
backward-step ensemble rollout (steps/sec/chip, primary) and train NLL
iterations/sec. This script emits both, plus the cylinder-array
mini-ensemble rollout (BASELINE config #2) and an on-chip compiled
(non-interpret) Pallas coupling-kernel parity + microbench record.

Output contract (driver-facing): one JSON line per completed section,
each a SUPERSET of the previous one — the LAST JSON line on stdout is
the record. Progressive emission is deliberate: round 2's single
end-of-run emission lost an already-measured primary number when the
driver timed the process out mid-run (BENCH_r02.json rc=124,
parsed=null). Now the primary record
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
is printed the moment the device rollout rate exists (~6 min in), and
each secondary section (train / cylinder / pallas) re-prints the
enriched record when it completes.

`vs_baseline` uses a COMMITTED CPU denominator (see
CPU_DENOMINATOR_STEPS_PER_SEC) instead of re-measuring CPU throughput
every run: the live CPU re-measure is what blew round 2's driver
budget. Re-measure it explicitly with `python bench.py --denominator`.

Timing discipline: the driver's observed budget is >=24 min (round 1
completed at 23.5 min, rc=0). Sections run most-important-first under
per-section start deadlines, and a hard watchdog emits whatever has
completed and exits before the driver's patience runs out.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

# Hard watchdog: the tunneled TPU client has been observed to HANG at
# init (not error) when the tunnel is wedged. Must fire INSIDE the
# driver's observed >=1440s budget so partial emission is reachable
# (round 2's 3300s watchdog never fired before the driver's kill).
# Sized to let a worst-case ~1100s rollout compile (observed round 1)
# still land the primary number; the SIGTERM handler below is the
# second net if the driver's timeout wins the race.
_WATCHDOG_S = 1390

# Extra time the watchdog grants the PRIMARY section after emitting its
# placeholder (see _watchdog): the placeholder guarantees the driver a
# parseable record, the grace window lets a just-late compile supersede
# it with the real number.
_WATCHDOG_GRACE_S = 200

# Latest wall-clock (seconds since start) at which each secondary
# section may START; a section past its deadline is skipped with an
# explicit marker instead of risking the record already in hand.
# The watchdog's progressive emission makes late sections harmless
# (worst case it fires mid-section, emits the current record, exits 0
# — and every skipped/unfinished section already carries its committed
# fallback), so deadlines are sized to give each live section a real
# chance after a worst-case ~900s primary compile, not to protect the
# record.
_SECTION_START_DEADLINE_S = {"train": 950, "cylinder": 1150, "pallas": 1250}

# CPU-reference throughput for the identical model/config (100-step,
# 64-sample backward-step ensemble on the host CPU) — the BASELINE.md
# denominator. Measured in round 1 on this machine (BENCH_r01.json:
# "cpu rate: 0.190 steps/s", XLA:CPU backend, nhwc layout). Re-measure
# with `python bench.py --denominator` (takes ~10 min: CPU compile of
# the rollout dominates); do NOT re-measure inline — that is what
# timed out round 2's driver run.
CPU_DENOMINATOR_STEPS_PER_SEC = 0.190

# Run-to-run spread of that CPU denominator measured across rounds on
# this machine (docs/PARITY.md: 0.09–0.19 steps/s depending on host
# load / thread placement). Recorded in the bench JSON so the record
# itself says the committed 0.190 is the FASTEST observed CPU rate —
# i.e. `vs_baseline` is the conservative (lower-bound) speedup.
CPU_DENOMINATOR_MEASURED_RANGE = (0.09, 0.19)

# The committed PRIMARY measurement (flagship rollout steps/s), used
# only as a clearly-labelled fallback when the live compile outlives
# the watchdog (compile variance through the remote helper measured
# 668s..>1390s for the identical graph within one day). From the
# 2026-08-22 r5 clean-solo bench (all sections live, is_fallback:false,
# runs/r5_bench_final.json).
COMMITTED_PRIMARY_STEPS_PER_SEC = 108.607

# Committed measurements reported when a section's live run is
# deadline-skipped (value, provenance). Keep in sync with the cited
# artifacts when they are re-measured.
_COMMITTED_FALLBACKS = {
    "train": {
        "train_windows_per_sec": (
            14.667,
            "committed r5 clean-solo bench on this chip (rc=0, "
            "2026-08-22, runs/r5_bench_final.json)",
        ),
    },
    "cylinder": {
        "cylinder_steps_per_sec": (
            420.503,
            "committed r5 clean-solo bench on this chip (rc=0, "
            "2026-08-22, runs/r5_bench_final.json)",
        ),
    },
    "pallas": {
        "pallas_parity_max_rel_err": (
            1.6e-5,
            "committed on-chip fused-kernel parity measurement "
            "(docs/PERF_NOTES.md 'Fused-kernel status')",
        ),
    },
}

ROLLOUT_STEPS = 100
N_SAMPLES = 64
CPU_STEPS = 8  # steady-state CPU denominator run (steps/sec is rate-based)

_T0 = time.monotonic()

# Filled section by section; printed (as a full JSON line) after every
# section so a mid-run kill still leaves the driver the latest record.
RESULT: dict = {}
_LAST_PRINTED: list[str] = [""]


def _elapsed() -> float:
    return time.monotonic() - _T0


def _emit() -> None:
    """Print the current RESULT as one JSON line (skip exact repeats)."""
    line = json.dumps(RESULT)
    if line != _LAST_PRINTED[0]:
        _LAST_PRINTED[0] = line
        print(line, flush=True)


def _watchdog():
    time.sleep(_WATCHDOG_S)
    print(
        f"# bench watchdog: still running after {_WATCHDOG_S}s — emitting "
        "partial results before the driver's timeout",
        file=sys.stderr,
        flush=True,
    )
    if "value" not in RESULT:
        # The primary compile can exceed the whole watchdog budget on a
        # bad day (observed 2026-08-21: >1390s, vs 668s for the same
        # graph two hours earlier): emit a parseable record NOW using
        # the committed primary measurement, clearly labelled, then
        # grant one grace window — a just-late compile supersedes it
        # with the live number as a later JSON line.
        _apply_primary_fallback("WATCHDOG")
        _emit()
        time.sleep(_WATCHDOG_GRACE_S)
        if RESULT.get("value_source") is None:
            os._exit(0)  # grace window won: live record already emitted
        _emit()
        os._exit(70)
    _emit()
    os._exit(0)


def _apply_primary_fallback(origin: str) -> None:
    """Fill the primary record from the committed measurement when the
    live run never produced one (labelled, never silent).

    ``is_fallback=true`` is a TOP-LEVEL boolean so a consumer keying on
    ``value``/``vs_baseline`` alone cannot mistake the committed
    constant for a fresh measurement (r3 advisor finding): provenance
    no longer lives only in the unit/value_source strings."""
    RESULT["is_fallback"] = True
    RESULT.setdefault("committed_fallback_value", COMMITTED_PRIMARY_STEPS_PER_SEC)
    RESULT.setdefault("metric", "rollout_steps_per_sec_chip_bstep64")
    RESULT.setdefault("value", COMMITTED_PRIMARY_STEPS_PER_SEC)
    RESULT.setdefault(
        "unit",
        "steps/s (100-step, 64-sample ensemble, backward-step) "
        f"[{origin}: live compile did not finish; committed fallback]",
    )
    RESULT.setdefault(
        "vs_baseline",
        round(
            COMMITTED_PRIMARY_STEPS_PER_SEC / CPU_DENOMINATOR_STEPS_PER_SEC,
            2,
        ),
    )
    RESULT.setdefault(
        "cpu_denominator_measured_range", list(CPU_DENOMINATOR_MEASURED_RANGE)
    )
    RESULT.setdefault(
        "value_source",
        "committed r3 bench run on this chip (rc=0, 2026-08-21, "
        "docs/PERF_NOTES.md r3) — live section did not finish",
    )


def _section_ok(name: str) -> bool:
    """Per-section start deadline (VERDICT r2 item 1): a section that
    would start too late is skipped explicitly rather than risking the
    driver killing the process mid-section."""
    deadline = _SECTION_START_DEADLINE_S[name]
    if _elapsed() <= deadline:
        return True
    _log(
        f"skipping {name} section: t={_elapsed():.0f}s past its "
        f"{deadline}s start deadline"
    )
    RESULT[f"{name}_skipped"] = f"start deadline {deadline}s exceeded"
    # A deadline-skipped section still reports its COMMITTED number so
    # the driver artifact is complete on slow-compile days (the r3
    # rehearsal: a 912s rollout compile skipped train+pallas). Source
    # of record for each constant is in _COMMITTED_FALLBACKS.
    for key, (val, src) in _COMMITTED_FALLBACKS.get(name, {}).items():
        RESULT.setdefault(key, val)
        RESULT.setdefault(f"{key}_source", src)
    return False


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
        case, 1, 2, cfg.model.hf_shape, cfg.model.lf_shape, seed=0,
        fixture_version=cfg.data.fixture_version,
    )
    state = init_lstm_state(cfg.model, (1,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]), state
    )
    lf_traj_np = np.concatenate(
        [generate_case(case, 1, 64, cfg.model.hf_shape,
                       cfg.model.lf_shape, seed=1,
                       fixture_version=cfg.data.fixture_version)[0][0]] * 2
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
        print(
            f"# [{time.strftime('%H:%M:%S')} +{_elapsed():.0f}s] {msg}",
            file=sys.stderr,
            flush=True,
        )


def _accelerator_reachable() -> bool:
    """Bounded subprocess probe of the default (accelerator) backend.

    The tunneled TPU client HANGS at init (does not error) when the
    tunnel is wedged, so the probe must live in a child process we can
    kill. Probing before this process touches any backend lets us fall
    back to CPU and still emit the JSON record the driver reads,
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
        "backward-step", b, t, cfg.model.hf_shape, cfg.model.lf_shape, seed=2,
        fixture_version=cfg.data.fixture_version,
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
    shape, plus a fused-op microbench."""
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


def _measure_denominator() -> None:
    """Explicit CPU-denominator re-measure (NOT run by the driver):
    prints the median CPU steps/s for the identical primary workload.
    Update CPU_DENOMINATOR_STEPS_PER_SEC from this when the model or
    config changes materially."""
    jax.config.update("jax_platforms", "cpu")
    _log("measuring CPU denominator (compile is the long pole)...")
    _, variables, rollout, lf_traj = _build()
    rate = _time_rollout(rollout, variables, lf_traj, CPU_STEPS, repeats=3)
    print(json.dumps({"cpu_denominator_steps_per_sec": round(rate, 4)}))


def _on_term(signum, frame):
    """The driver kills overruns with `timeout` (SIGTERM first —
    round 2 died with rc=124 and lost its measured number). Flush the
    latest record before dying so the kill costs nothing measured."""
    print(
        "# bench: SIGTERM received — emitting partial results",
        file=sys.stderr,
        flush=True,
    )
    if "value" not in RESULT:
        _apply_primary_fallback("SIGTERM")
    _emit()
    os._exit(124)


def main() -> None:
    signal.signal(signal.SIGTERM, _on_term)
    threading.Thread(target=_watchdog, daemon=True).start()
    if "--denominator" in sys.argv:
        _measure_denominator()
        return
    # Persistent compilation cache: the rollout/train compiles dominate
    # bench wall time (~6 min); caching them makes driver re-runs cheap.
    # Best-effort — harmless if the backend ignores it.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass
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

    # On CPU (no accelerator) the 100-step x 5-run protocol would take
    # hours and trip the watchdog; the metric is a steady-state rate, so
    # a short run measures the same quantity.
    if on_tpu:
        value = _time_rollout(rollout, variables, lf_traj, ROLLOUT_STEPS)
        denominator = CPU_DENOMINATOR_STEPS_PER_SEC
        denom_src = "committed constant (BENCH_r01 measured; see --denominator)"
    else:
        value = _time_rollout(rollout, variables, lf_traj, CPU_STEPS, repeats=1)
        denominator = value  # CPU-on-CPU: speedup is 1 by construction
        denom_src = "self (CPU run)"
    RESULT.pop("value_source", None)  # live number supersedes fallback
    RESULT.pop("committed_fallback_value", None)
    RESULT.update(
        {
            "metric": "rollout_steps_per_sec_chip_bstep64",
            "is_fallback": False,  # live measurement (r3 advisor finding)
            "value": round(value, 3),
            "unit": "steps/s (100-step, 64-sample ensemble, backward-step)"
            + (" [CPU FALLBACK: accelerator unreachable]" if fallback else ""),
            "vs_baseline": round(value / denominator, 2),
            "cpu_denominator_steps_per_sec": denominator,
            "cpu_denominator_measured_range": list(CPU_DENOMINATOR_MEASURED_RANGE),
            "denominator_source": denom_src,
        }
    )
    _log(f"device rate: {value:.2f} steps/s — primary record emitted")
    _emit()  # the primary record exists NOW; every later line enriches it

    # --- Secondary sections: most-important-first, fail soft, each
    # guarded by a start deadline and followed by a re-emit. ---
    if on_tpu and _section_ok("train"):
        try:
            _log("timing fused train step (train NLL it/sec)...")
            RESULT["train_windows_per_sec"] = round(_bench_train(), 3)
        except Exception as e:  # noqa: BLE001 — report, don't die
            _log(f"train bench failed: {e!r}")
            RESULT["train_windows_per_sec"] = None
        _emit()

    if on_tpu and _section_ok("cylinder"):
        try:
            _log("timing cylinder-array mini-ensemble rollout (config #2)...")
            _, cyl_vars, cyl_rollout, cyl_lf = _build("cylinder-array", 4)
            RESULT["cylinder_steps_per_sec"] = round(
                _time_rollout(cyl_rollout, cyl_vars, cyl_lf, ROLLOUT_STEPS,
                              repeats=3), 3,
            )
        except Exception as e:  # noqa: BLE001
            _log(f"cylinder bench failed: {e!r}")
            RESULT["cylinder_steps_per_sec"] = None
        _emit()

    if on_tpu and _section_ok("pallas"):
        try:
            _log("pallas on-chip parity + microbench...")
            RESULT["pallas"] = _bench_pallas_parity()
        except Exception as e:  # noqa: BLE001
            _log(f"pallas parity failed: {e!r}")
            RESULT["pallas"] = None
        _emit()

    _log(f"done in {_elapsed():.0f}s")
    _emit()


if __name__ == "__main__":
    sys.exit(main())
