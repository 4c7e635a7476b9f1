"""Contracts consumed by the external driver, pinned by tests:

- ``bench.py`` must print exactly ONE JSON line with the agreed keys
  (the driver records it as the round's benchmark result).
- ``__graft_entry__.entry()`` must return a jittable forward step plus
  example args, and ``dryrun_multichip(n)`` must compile+execute the
  full sharded training step on an n-device mesh (the driver validates
  multi-chip sharding this way with virtual CPU devices).
"""

import importlib.util
import json
import pathlib
import sys

import jax
import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(name, ROOT / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bench_prints_one_json_line(monkeypatch, capsys):
    bench = _load("bench")

    # Stub the heavy pieces: this test pins the OUTPUT CONTRACT, not
    # the measurement (bench runs for real on hardware every round).
    monkeypatch.setattr(
        bench, "_build", lambda *a, **k: ("cfg", "vars", "rollout", "traj")
    )
    monkeypatch.setattr(
        bench, "_time_rollout", lambda *a, **k: 123.456
    )
    # The real probe would attach a client to this machine's registered
    # accelerator plugin (slow; hangs when the tunnel is wedged) — the
    # probe's own behavior is covered by the fallback test below.
    monkeypatch.setattr(bench, "_accelerator_reachable", lambda: True)
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "cpu")
    monkeypatch.setattr(sys, "argv", ["bench.py", "--quiet"])

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    json_lines = [l for l in out if not l.startswith("#")]
    assert len(json_lines) == 1, out
    rec = json.loads(json_lines[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["metric"] == "rollout_steps_per_sec_chip_bstep64"
    assert rec["value"] == 123.456
    assert rec["vs_baseline"] == 1.0  # cpu backend: denominator = value


def test_bench_cpu_fallback_still_emits_json(monkeypatch, capsys):
    """With the accelerator unreachable (wedged tunnel), bench must
    still print its one JSON line — CPU-measured, honestly labelled —
    rather than hanging into the watchdog with no output."""
    bench = _load("bench")

    monkeypatch.setattr(
        bench, "_build", lambda *a, **k: ("cfg", "vars", "rollout", "traj")
    )
    monkeypatch.setattr(bench, "_time_rollout", lambda *a, **k: 0.25)
    monkeypatch.setattr(bench, "_accelerator_reachable", lambda: False)
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "cpu")
    monkeypatch.setattr(
        bench.jax.config, "update", lambda *a, **k: None
    )  # platform already forced to cpu by conftest
    monkeypatch.setattr(sys, "argv", ["bench.py", "--quiet"])
    monkeypatch.delenv("TPUFLOW_PLATFORM", raising=False)

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    json_lines = [l for l in out if not l.startswith("#")]
    assert len(json_lines) == 1, out
    rec = json.loads(json_lines[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert "[CPU FALLBACK" in rec["unit"]
    assert rec["vs_baseline"] == 1.0


def test_graft_entry_forward_step_jits():
    g = _load("__graft_entry__")
    fn, args = g.entry()
    bpd, state = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(bpd)))
    assert jax.tree.leaves(state), "recurrent state missing from step output"


def test_graft_entry_dryrun_multichip_8dev():
    g = _load("__graft_entry__")
    g.dryrun_multichip(8)  # raises/asserts on any sharding failure
