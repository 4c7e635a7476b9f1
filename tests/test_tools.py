"""Torch-checkpoint converter tests: layout rules, roundtrip through a
real torch state_dict, shape validation (SURVEY.md §5 checkpoint row)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax


from tpuflow.configs.config import CaseConfig, DataConfig, ModelConfig
from tpuflow.models import TMGlow, init_lstm_state
from tpuflow.tools.convert_torch import (
    convert_state_dict,
    partition_variables,
    torch_tensor_to_flax,
)

MC = ModelConfig(
    n_scales=2, n_flow_steps=2, channels=3, hf_shape=(16, 32),
    lf_shape=(4, 8), coupling_width=8, coupling_layers=2, growth_rate=4,
    encoder_width=8, lstm_hidden=8, cond_channels=8,
    compute_dtype="float32", use_pallas=False,
)


def test_layout_rules():
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    out = torch_tensor_to_flax("kernel", w)
    assert out.shape == (5, 7, 3, 2)  # OIHW -> HWIO
    lin = np.arange(6).reshape(2, 3).astype(np.float32)
    assert torch_tensor_to_flax("kernel", lin).shape == (3, 2)
    b = np.arange(4).astype(np.float32)
    np.testing.assert_array_equal(torch_tensor_to_flax("bias", b), b)


def _model_variables():
    # Random init batch: ActNorm's data-dependent init degenerates on
    # constant inputs (std=0 -> 1e6 scales).
    model = TMGlow(MC)
    hf = jax.random.normal(jax.random.PRNGKey(1), (1, *MC.hf_shape, 3))
    lf = jax.random.normal(jax.random.PRNGKey(2), (1, *MC.lf_shape, 3))
    return model.init(jax.random.PRNGKey(0), hf, lf, init_lstm_state(MC, (1,)))


def _variables_to_torch_state_dict(variables):
    """Inverse mapping: full flax variables (params + buffers, the way a
    torch ``state_dict()`` carries both flat) -> torch state_dict."""
    sd = _params_to_torch_state_dict(variables["params"])
    sd.update(_params_to_torch_state_dict(variables["buffers"]))
    return sd


def _params_to_torch_state_dict(params):
    """Inverse mapping: flax params -> torch-convention state_dict."""
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [str(p.key) for p in path]
        arr = np.asarray(leaf, dtype=np.float32)
        name = ".".join(keys)
        if keys[-1] == "kernel":
            name = ".".join(keys[:-1]) + ".weight"
            if arr.ndim == 4:  # HWIO -> OIHW
                arr = np.transpose(arr, (3, 2, 0, 1))
            elif arr.ndim == 2:
                arr = np.transpose(arr, (1, 0))
        sd[name] = torch.from_numpy(arr.copy())
    return sd


@pytest.mark.slow  # 16-45s on the 1-core bench host
def test_convert_roundtrip_and_validation():
    variables = _model_variables()
    sd = _variables_to_torch_state_dict(variables)
    converted = convert_state_dict(sd)

    # Validation goes through the production partitioner (the same code
    # main() gates on), not a test-only copy of its logic.
    cfg = CaseConfig(name="backward-step", model=MC, data=DataConfig())
    params, buffers, problems = partition_variables(converted, cfg)
    assert problems == [], problems[:5]

    # Values roundtrip exactly (params and buffers both).
    for coll, tree in (("params", params), ("buffers", buffers)):
        ref = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        got = jax.tree_util.tree_flatten_with_path(tree)[0]
        assert len(ref) == len(got)
        for (pa, a), (pb, b) in zip(sorted(ref, key=str), sorted(got, key=str)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Converted variables drive the real model.
    model = TMGlow(MC)
    hf = jax.random.normal(jax.random.PRNGKey(1), (1, *MC.hf_shape, 3))
    lf = jax.random.normal(jax.random.PRNGKey(2), (1, *MC.lf_shape, 3))
    bpd, _ = model.apply(
        {"params": params, "buffers": buffers},
        hf, lf, init_lstm_state(MC, (1,)),
    )
    assert np.all(np.isfinite(bpd))


def test_validation_catches_mismatch():
    variables = _model_variables()
    sd = _variables_to_torch_state_dict(variables)
    sd.pop(sorted(sd)[0])  # drop one tensor
    converted = convert_state_dict(sd)
    cfg = CaseConfig(name="backward-step", model=MC, data=DataConfig())
    _, _, problems = partition_variables(converted, cfg)
    assert any("missing" in p for p in problems)


def test_convert_main_produces_loadable_checkpoint(tmp_path):
    """End-to-end: torch.save a full state_dict (params AND buffers —
    torch state_dicts carry registered buffers like the inv-1x1 P /
    sign factors), run the converter CLI, then restore through the
    ordinary eval loading path and reproduce the source model's NLL."""
    import jax.numpy as jnp

    from tpuflow.eval.loading import load_eval_bundle
    from tpuflow.tools.convert_torch import main as convert_main

    model = TMGlow(MC)
    hf = jax.random.normal(jax.random.PRNGKey(1), (1, *MC.hf_shape, 3))
    lf = jax.random.normal(jax.random.PRNGKey(2), (1, *MC.lf_shape, 3))
    variables = model.init(
        jax.random.PRNGKey(0), hf, lf, init_lstm_state(MC, (1,))
    )
    sd = _params_to_torch_state_dict(variables["params"])
    # Buffers convert with no layout rule (their leaves are not
    # named weight/kernel).
    for name, arr in _params_to_torch_state_dict(variables["buffers"]).items():
        sd[name] = arr
    pt = tmp_path / "source.pt"
    torch.save(sd, pt)

    overrides = [
        "backward-step",
        "model.n_scales=2", "model.n_flow_steps=2", "model.coupling_width=8",
        "model.coupling_layers=2", "model.growth_rate=4",
        "model.encoder_width=8", "model.lstm_hidden=8",
        "model.cond_channels=8", "model.hf_shape=16,32", "model.lf_shape=4,8",
        "model.compute_dtype=float32", "model.use_pallas=false",
        "data.n_train_traj=2", "data.n_test_traj=1", "data.train_steps=4",
        f"train.checkpoint_dir={tmp_path}/ckpt",
    ]
    out_dir = tmp_path / "ckpt" / "backward-step"
    convert_main([str(pt), str(out_dir)] + overrides)

    from tpuflow.cli import parse_args

    cfg = parse_args(overrides)
    model2, variables2, norm, _meta = load_eval_bundle(cfg)
    assert norm is not None  # converter computed dataset constants
    bpd_src, _ = model.apply(variables, hf, lf, init_lstm_state(MC, (1,)))
    bpd_conv, _ = model2.apply(
        variables2, hf, lf, init_lstm_state(MC, (1,))
    )
    np.testing.assert_allclose(
        np.asarray(bpd_conv), np.asarray(bpd_src), rtol=1e-5
    )
    # Buffers really came from the dump, not a fresh seed.
    p_src = jnp.asarray(
        variables["buffers"]["glow"]["scale0_step0"]["invconv"]["p"]
    )
    p_conv = jnp.asarray(
        variables2["buffers"]["glow"]["scale0_step0"]["invconv"]["p"]
    )
    np.testing.assert_array_equal(np.asarray(p_src), np.asarray(p_conv))


@pytest.mark.slow  # 16-45s on the 1-core bench host
def test_export_rollout_roundtrip(tmp_path):
    """jax.export serving artifact: serialize the rollout (weights +
    denormalization baked in), deserialize WITHOUT any tpuflow code
    path, and reproduce the in-process rollout exactly."""
    import pathlib

    import jax
    import numpy as np
    from jax import export as jax_export

    from tpuflow.cli.train import main as train_main
    from tpuflow.tools.export_rollout import main as export_main

    overrides = [
        "backward-step",
        "model.n_scales=2", "model.n_flow_steps=2", "model.coupling_width=8",
        "model.coupling_layers=2", "model.growth_rate=4",
        "model.encoder_width=8", "model.lstm_hidden=8", "model.cond_channels=8",
        "model.hf_shape=16,32", "model.lf_shape=4,8",
        "model.compute_dtype=float32", "model.use_pallas=false",
        "data.n_train_traj=4", "data.n_test_traj=2", "data.train_steps=8",
        "data.window=4", "data.batch_size=4",
        f"train.checkpoint_dir={tmp_path}/ckpt",
        "train.epochs=1", "train.checkpoint_every=1", "train.log_every=1000",
        "eval.rollout_steps=6", "eval.n_samples=4",
        f"eval.output_dir={tmp_path}/eval",
    ]
    train_main(overrides)
    out = export_main(overrides + ["export_platforms=cpu"])
    assert out.exists() and out.stat().st_size > 1000

    # Serving side (load_artifact = deserialize + the LAPACK
    # registration warmup a fresh serving process needs).
    from tpuflow.tools.export_rollout import load_artifact

    fn = load_artifact(out)
    from tpuflow.cli import parse_args
    from tpuflow.data.dataset import load_dataset
    from tpuflow.eval.loading import load_eval_bundle
    from tpuflow.eval.rollout import make_ensemble_rollout

    cfg = parse_args(overrides)
    model, variables, norm, ckpt_meta = load_eval_bundle(cfg)
    ds = load_dataset(cfg.data, cfg.model, "test", norm=norm)
    lf = np.asarray(ds.lf[0, :6], dtype=np.float32)

    # Per-scale artifact contract (r4): tau is an (n_scales,) vector;
    # a uniform vector == the scalar behavior.
    tau_vec = np.full((cfg.model.n_scales,), cfg.eval.temperature, np.float32)
    served = fn.call(lf, np.uint32(7), tau_vec)
    rollout = jax.jit(
        make_ensemble_rollout(model, 4, cfg.eval.temperature, "stats")
    )
    ref = rollout(variables, lf, jax.random.PRNGKey(np.uint32(7)))
    np.testing.assert_allclose(
        np.asarray(served["mean"]),
        ds.denorm_hf(np.asarray(ref["mean"])),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(served["var"]),
        ds.denorm_hf_var(np.asarray(ref["var"])),
        atol=1e-5,
    )
    # Temperature is a runtime argument of the artifact: tau=0 collapses
    # the ensemble onto the conditional-prior mean (zero spread).
    cold = fn.call(lf, np.uint32(7), np.zeros_like(tau_vec))
    assert float(np.asarray(cold["var"]).max()) < 1e-8

    # ---- serving tier (tools/serve.py) on the same artifact ----
    import io
    import json
    import threading
    import urllib.error
    import urllib.request

    from tpuflow.tools.serve import (
        RolloutServer, build_parser, make_http_server, run_batch,
    )

    # Sidecar written by the exporter; RolloutServer normalizes
    # physical-unit requests with its constants, so serving a
    # denormalized LF reproduces fn.call on the normalized one.
    assert out.with_suffix(".meta.json").exists()
    server = RolloutServer(out)
    lf_phys = ds.denorm_lf(lf)
    served2 = server.rollout(lf_phys, seed=7)
    np.testing.assert_allclose(
        served2["mean"], np.asarray(served["mean"]), rtol=1e-4, atol=1e-5
    )
    with np.testing.assert_raises(ValueError):
        server.rollout(lf_phys[:3], seed=7)  # fixed-shape contract

    # Batch mode: physical npz in -> physical mean/var npz out.
    inp = tmp_path / "lf.npz"
    np.savez(inp, lf=lf_phys)
    args = build_parser().parse_args([
        "batch", "--artifact", str(out), "--input", str(inp),
        "--output", str(tmp_path / "stats.npz"), "--seed", "7",
    ])
    run_batch(args)
    with np.load(tmp_path / "stats.npz") as got:
        np.testing.assert_allclose(
            got["mean"], np.asarray(served["mean"]), rtol=1e-4, atol=1e-5
        )

    # HTTP mode: POST npz body, parse npz response; healthz serves meta.
    httpd = make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        health = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30
            ).read()
        )
        assert health["n_samples"] == 4 and health["rollout_steps"] == 6
        buf = io.BytesIO()
        np.savez(buf, lf=lf_phys)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rollout?seed=7",
            data=buf.getvalue(), method="POST",
        )
        resp = urllib.request.urlopen(req, timeout=120).read()
        with np.load(io.BytesIO(resp)) as got:
            np.testing.assert_allclose(
                got["mean"], np.asarray(served["mean"]),
                rtol=1e-4, atol=1e-5,
            )
        # Malformed request -> 400, server keeps serving.
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/rollout", data=b"junk", method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # examples/serve_client.py (the documented consumer recipe —
        # numpy + stdlib only) reproduces the same rollout through the
        # same endpoint; with no --lf it synthesizes a contract-shaped
        # trajectory and must round-trip cleanly too.
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "serve_client",
            pathlib.Path(__file__).parent.parent / "examples/serve_client.py",
        )
        client = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(client)
        url = f"http://127.0.0.1:{port}"
        got = client.main([
            "--url", url, "--lf", str(inp), "--seed", "7",
            "--out", str(tmp_path / "client.npz"),
        ])
        np.testing.assert_allclose(
            got["mean"], np.asarray(served["mean"]), rtol=1e-4, atol=1e-5
        )
        synth = client.main(["--url", url, "--seed", "3"])
        assert synth["mean"].shape == np.asarray(served["mean"]).shape
        assert np.all(np.isfinite(synth["mean"]))
    finally:
        httpd.shutdown()

    # Calibration deployment: before evaluation no factor exists ->
    # loud client error; after (a minimal eval_metrics.json) the
    # re-exported sidecar carries it and calibrated var = s^2 * raw.
    with np.testing.assert_raises(ValueError):
        server.rollout(lf_phys, seed=7, calibrated=True)
    metrics_path = (
        tmp_path / "eval" / "backward-step" / "eval_metrics.json"
    )
    metrics_path.parent.mkdir(parents=True, exist_ok=True)
    metrics_path.write_text(json.dumps({
        "spread_scale": 2.0, "interval_scales": {"0.50": 1.5, "0.95": 2.5},
    }))
    out2 = export_main(overrides + ["export_platforms=cpu"])
    server2 = RolloutServer(out2)
    assert server2.meta["spread_scale"] == 2.0
    assert server2.meta["interval_scales"]["0.95"] == 2.5
    raw = server2.rollout(lf_phys, seed=7)
    cal = server2.rollout(lf_phys, seed=7, calibrated=True)
    np.testing.assert_allclose(cal["mean"], raw["mean"], atol=0)
    np.testing.assert_allclose(cal["var"], 4.0 * raw["var"], rtol=1e-6)

    # Minimal-host contract (tools/artifact.py): standing up the server
    # and running a rollout must not import the model/training stack.
    import subprocess
    import sys as _sys

    probe = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import sys\n"
        "from tpuflow.tools.serve import RolloutServer\n"
        f"s = RolloutServer({str(out)!r})\n"
        "import numpy as np\n"
        "s.rollout(np.zeros(tuple(s.meta['lf_input_shape']), np.float32))\n"
        "heavy = [m for m in ('flax','orbax','optax','tpuflow.models',"
        "'tpuflow.eval','tpuflow.data','tpuflow.cli') if m in sys.modules]\n"
        "print('HEAVY:' + ','.join(heavy))\n"
        # os._exit skips buffer flushes: piped stdout is block-buffered,
        # so flush explicitly or the print is lost wherever
        # PYTHONUNBUFFERED isn't set ambiently.
        "sys.stdout.flush()\n"
        "import os; os._exit(0)\n"  # axon-plugin teardown segfaults
    )
    res = subprocess.run(
        [_sys.executable, "-c", probe], capture_output=True, text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "HEAVY:\n" in res.stdout or res.stdout.strip().endswith("HEAVY:"), (
        res.stdout
    )


# ---------------------------------------------------------------- supervisor


def _sup_cfg(**kw):
    from tpuflow.tools.supervise_train import SupervisorConfig

    base = dict(
        stall_timeout=1.0, compile_grace=1.5, max_restarts=3,
        poll_interval=0.1, max_leg_seconds=0.0, wedge_cooldown=0.0,
    )
    base.update(kw)
    return SupervisorConfig(**base)


def test_supervisor_clean_completion(tmp_path):
    """A healthy child (heartbeat advances, exits 0) needs no restarts."""
    import sys

    from tpuflow.tools.supervise_train import supervise

    hb = tmp_path / "train_log.csv"
    # -S skips sitecustomize (which loads an accelerator plugin and
    # costs ~2s of child startup) — these children are stdlib-only.
    cmd = [
        sys.executable, "-S", "-c",
        f"import pathlib; pathlib.Path({str(hb)!r}).touch()",
    ]
    res = supervise(cmd, hb, _sup_cfg(), log=lambda m: None)
    assert (res.exit_code, res.restarts, res.stalls) == (0, 0, 0)


def test_supervisor_restarts_stalled_child(tmp_path):
    """A child that heartbeats once then hangs is killed on the stall
    timeout and relaunched; the relaunch (simulated resume) completes.
    This is the production failure mode: a wedged accelerator tunnel
    leaves the process alive but progress-free."""
    import sys

    from tpuflow.tools.supervise_train import supervise

    hb = tmp_path / "train_log.csv"
    marker = tmp_path / "already_ran"
    child = (
        "import pathlib, sys, time\n"
        f"hb, marker = pathlib.Path({str(hb)!r}), pathlib.Path({str(marker)!r})\n"
        "if marker.exists():\n"
        "    sys.exit(0)\n"
        "marker.touch()\n"
        "hb.touch()\n"
        "time.sleep(60)\n"
    )
    cmd = [sys.executable, "-S", "-c", child]
    t0 = __import__("time").monotonic()
    res = supervise(cmd, hb, _sup_cfg(), log=lambda m: None)
    assert (res.exit_code, res.restarts, res.stalls) == (0, 1, 1)
    assert __import__("time").monotonic() - t0 < 30  # killed, not waited out


def test_supervisor_restart_budget(tmp_path):
    """A child that never makes progress exhausts the restart budget
    and the supervisor fails loudly (exit 1) instead of looping."""
    import sys

    from tpuflow.tools.supervise_train import supervise

    hb = tmp_path / "train_log.csv"
    cmd = [sys.executable, "-S", "-c", "import time; time.sleep(60)"]
    res = supervise(
        cmd, hb, _sup_cfg(compile_grace=0.5, max_restarts=1),
        log=lambda m: None,
    )
    assert res.exit_code == 1
    assert res.restarts == 1 and res.stalls == 2


def test_supervisor_wedge_cooldown(tmp_path):
    """A no-first-heartbeat stall (wedged-tunnel signature) sleeps
    wedge_cooldown before the relaunch — relaunching into a wedged
    tunnel immediately has been observed to re-wedge it. A crash or
    post-progress stall must NOT pay the cooldown."""
    import sys
    import time

    from tpuflow.tools.supervise_train import supervise

    hb = tmp_path / "train_log.csv"
    marker = tmp_path / "already_ran"
    child = (
        "import pathlib, sys, time\n"
        f"marker = pathlib.Path({str(marker)!r})\n"
        "if marker.exists():\n"
        "    sys.exit(0)\n"
        "marker.touch()\n"
        "time.sleep(60)\n"  # never heartbeats -> wedge signature
    )
    cmd = [sys.executable, "-S", "-c", child]
    t0 = time.monotonic()
    res = supervise(
        cmd, hb, _sup_cfg(compile_grace=0.5, wedge_cooldown=2.0),
        log=lambda m: None,
    )
    assert (res.exit_code, res.restarts, res.stalls) == (0, 1, 1)
    assert time.monotonic() - t0 >= 2.0  # cooled down before relaunch

    # Crash path: no cooldown even with a nonzero wedge_cooldown.
    marker2 = tmp_path / "crash_ran"
    crash_child = (
        "import pathlib, sys\n"
        f"marker = pathlib.Path({str(marker2)!r})\n"
        "if marker.exists():\n"
        "    sys.exit(0)\n"
        "marker.touch()\n"
        "sys.exit(3)\n"
    )
    t0 = time.monotonic()
    res = supervise(
        [sys.executable, "-S", "-c", crash_child], hb,
        _sup_cfg(wedge_cooldown=30.0), log=lambda m: None,
    )
    assert (res.exit_code, res.crashes) == (0, 1)
    assert time.monotonic() - t0 < 20  # relaunched immediately


def test_supervisor_crash_restart(tmp_path):
    """A crashing child (nonzero exit) is restarted from checkpoint."""
    import sys

    from tpuflow.tools.supervise_train import supervise

    hb = tmp_path / "train_log.csv"
    marker = tmp_path / "already_ran"
    child = (
        "import pathlib, sys\n"
        f"marker = pathlib.Path({str(marker)!r})\n"
        "if marker.exists():\n"
        "    sys.exit(0)\n"
        "marker.touch()\n"
        "sys.exit(3)\n"
    )
    res = supervise([sys.executable, "-S", "-c", child], hb, _sup_cfg(),
                    log=lambda m: None)
    assert (res.exit_code, res.restarts, res.crashes) == (0, 1, 1)


def test_report_builds_from_eval_metrics(tmp_path):
    """tools/report consolidates an evaluation run into report.md."""
    import json

    from tpuflow.tools.report import build_report

    out = tmp_path / "case"
    out.mkdir()
    (out / "eval_metrics.json").write_text(json.dumps({
        "test_bpd": -9.1, "field_rel_l2_mean": 0.012, "tke_rel_l2_mean": 0.02,
        "n_test_traj": 2, "steps": 8, "n_samples": 4, "backend": "cpu",
        "spread_scale": 2.0, "calibration_in_sample": False,
        "coverage_holdout_raw": {"0.50": 0.2, "0.95": 0.5},
        "coverage_holdout_recalibrated": {"0.50": 0.45, "0.95": 0.9},
        "crps_holdout_raw": 0.01, "crps_holdout_recalibrated": 0.008,
    }))
    (out / "rollout_metrics.json").write_text(json.dumps({
        "rollout_steps_per_sec": 111.0, "steps": 8, "n_samples": 4,
        "temperature": 0.7, "backend": "cpu",
    }))
    (out / "tke.png").write_bytes(b"png")
    md = build_report(out, "case")
    assert "-9.1" in md and "111" in md and "tke.png" in md
    assert "raw ensemble quantiles" in md and "0.45" in md

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="evaluate"):
        build_report(tmp_path, "missing")


def test_supervisor_cli_flag_parsing(monkeypatch, tmp_path):
    """main() splits --supervisor flags from train passthrough args,
    rejects unknown flags, and derives the heartbeat path from the
    parsed case config."""
    import pytest as _pytest

    import tpuflow.tools.supervise_train as st

    seen = {}

    def fake_supervise(cmd, heartbeat, cfg, log=None):
        seen["cmd"], seen["hb"], seen["cfg"] = cmd, heartbeat, cfg
        return st.SupervisorResult(0, 0, 0, 0)

    monkeypatch.setattr(st, "supervise", fake_supervise)
    rc = st.main([
        "backward-step", f"train.checkpoint_dir={tmp_path}",
        "--stall-timeout=123", "--max-restarts=2",
    ])
    assert rc == 0
    assert seen["cfg"].stall_timeout == 123.0
    assert seen["cfg"].max_restarts == 2
    assert str(seen["hb"]).endswith("backward-step/train_log.csv")
    assert "--stall-timeout=123" not in seen["cmd"]  # not passed through
    assert "backward-step" in seen["cmd"]

    with _pytest.raises(SystemExit, match="unknown supervisor flag"):
        st.main(["backward-step", "--bogus=1"])


# ------------------------------------------------------------- inspect_data


def test_inspect_data_ok_archive(tmp_path, capsys):
    """A contract-conforming archive inspects clean: shapes, stats,
    high LF<->HF correlation (synthetic fixtures are pooled HF), exit 0."""
    from tpuflow.data import generate_case
    from tpuflow.data.dataset import save_archive
    from tpuflow.tools.inspect_data import inspect_archive, main

    lf, hf = generate_case("backward-step", 2, 4, (32, 64), (8, 16), seed=3)
    p = tmp_path / "backward-step_train.npz"
    save_archive(p, lf, hf)

    rec = inspect_archive(p, n_scales=3)
    assert rec["ok"], rec["errors"]
    assert rec["lf_shape"] == [2, 4, 8, 16, 3]
    assert max(rec["lf_hf_correlation"].values()) > 0.5

    assert main([str(p)]) == 0
    out = capsys.readouterr().out
    assert "contract: OK" in out and "lf<->hf corr" in out


def test_inspect_data_flags_violations(tmp_path, capsys):
    """Misaligned (N, T), bad squeeze divisibility, and NaNs are each
    reported as contract errors; exit code 1."""
    import numpy as np

    from tpuflow.data.dataset import save_archive
    from tpuflow.tools.inspect_data import inspect_archive, main

    lf = np.zeros((2, 4, 8, 16, 3), np.float32)
    hf = np.zeros((2, 3, 30, 62, 3), np.float32)  # T mismatch + not /8
    hf[0, 0, 0, 0, 0] = np.nan
    p = tmp_path / "bad.npz"
    save_archive(p, lf, hf)

    rec = inspect_archive(p, n_scales=3)
    assert not rec["ok"]
    msgs = " ".join(rec["errors"])
    assert "misaligned" in msgs
    assert "divisible" in msgs
    assert "non-finite" in msgs
    assert main([str(p)]) == 1
    assert "VIOLATED" in capsys.readouterr().out


def test_inspect_data_json_mode(tmp_path, capsys):
    import json as _json

    from tpuflow.data import generate_case
    from tpuflow.data.dataset import save_archive
    from tpuflow.tools.inspect_data import main

    lf, hf = generate_case("cylinder-array", 1, 2, (32, 64), (8, 16), seed=0)
    p = tmp_path / "c.npz"
    save_archive(p, lf, hf)
    assert main([str(p), "--json", "--n-scales=2"]) == 0
    rec = _json.loads(capsys.readouterr().out)
    assert rec["ok"] and rec["hf_shape"] == [1, 2, 32, 64, 3]


# -------------------------------------------------------- inspect_checkpoint


def _tiny_checkpoint(tmp_path, mutate=None):
    """Save a real (tiny-config) training state and return its dir."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpuflow.configs.config import CaseConfig, DataConfig
    from tpuflow.train.checkpoint import Checkpointer
    from tpuflow.train.step import make_optimizer

    cfg = CaseConfig(name="backward-step", model=MC, data=DataConfig())
    model = TMGlow(MC)
    hf = jax.random.normal(jax.random.PRNGKey(1), (1, *MC.hf_shape, 3))
    lf = jax.random.normal(jax.random.PRNGKey(2), (1, *MC.lf_shape, 3))
    variables = model.init(
        jax.random.PRNGKey(0), hf, lf, init_lstm_state(MC, (1,))
    )
    opt = make_optimizer(1e-3, 0.995, 10.0)
    state = {
        "params": variables["params"],
        "buffers": variables["buffers"],
        "opt_state": opt.init(variables["params"]),
        "norm": {k: jnp.ones((3,)) for k in
                 ("lf_mean", "lf_std", "hf_mean", "hf_std")},
    }
    if mutate:
        state = mutate(state)
    d = tmp_path / "run"
    ck = Checkpointer(d)
    ck.save(7, state, meta={"epoch": 7, "global_step": 70,
                            "config": dataclasses.asdict(cfg)})
    ck.close()
    return d


def test_inspect_checkpoint_ok(tmp_path, capsys):
    from tpuflow.tools.inspect_checkpoint import inspect_checkpoint, main

    d = _tiny_checkpoint(tmp_path)
    rec = inspect_checkpoint(d)
    assert rec["ok"], rec["errors"]
    assert rec["steps"] == [7] and rec["epoch"] == 7
    assert rec["params"]["values"] > 0
    assert main([str(d)]) == 0
    assert "checkpoint: OK" in capsys.readouterr().out


def test_inspect_checkpoint_flags_drift_and_nonfinite(tmp_path, capsys):
    """A shape drifted from the stored config and a NaN leaf are both
    reported; exit 1."""
    import numpy as np

    from tpuflow.tools.inspect_checkpoint import inspect_checkpoint, main

    def mutate(state):
        import jax

        leaves, treedef = jax.tree.flatten(state["params"])
        leaves[0] = np.concatenate([np.asarray(leaves[0])] * 2, axis=-1)
        leaves[1] = np.full_like(np.asarray(leaves[1]), np.nan)
        state["params"] = jax.tree.unflatten(treedef, leaves)
        return state

    d = _tiny_checkpoint(tmp_path, mutate=mutate)
    rec = inspect_checkpoint(d)
    assert not rec["ok"]
    msgs = " ".join(rec["errors"])
    assert "non-finite" in msgs and "shape" in msgs
    assert main([str(d)]) == 1
    assert "UNSOUND" in capsys.readouterr().out


def test_inspect_checkpoint_empty_dir(tmp_path):
    """A mistyped path reports cleanly AND is not created on disk (an
    inspector must be read-only); an existing-but-empty dir reports
    'no checkpoint'."""
    from tpuflow.tools.inspect_checkpoint import inspect_checkpoint

    missing = tmp_path / "none"
    rec = inspect_checkpoint(missing)
    assert not rec["ok"] and "does not exist" in rec["errors"][0]
    assert not missing.exists()

    empty = tmp_path / "empty"
    empty.mkdir()
    rec = inspect_checkpoint(empty)
    assert not rec["ok"] and "no checkpoint" in rec["errors"][0]


def test_inspect_checkpoint_corrupted_save(tmp_path):
    """A truncated/corrupted save reports UNSOUND instead of an orbax
    traceback (the OPERATIONS.md troubleshooting contract)."""
    from tpuflow.tools.inspect_checkpoint import inspect_checkpoint

    d = _tiny_checkpoint(tmp_path)
    # Corrupt the array store: truncate every file under state/.
    for f in (d / "7" / "state").rglob("*"):
        if f.is_file():
            f.write_bytes(b"corrupt")
    rec = inspect_checkpoint(d)
    assert not rec["ok"]
    assert any("restore failed" in e for e in rec["errors"])


# ------------------------------------------------------------- compare_runs


def test_compare_runs(tmp_path, capsys):
    import json as _json

    from tpuflow.tools.compare_runs import compare, main

    a = {"test_bpd": -9.0, "field_rel_l2_mean": 0.015, "crps_mean": 0.005,
         "n_samples": 64, "backend": "tpu", "ensemble_var_mean": 1.0}
    b = {"test_bpd": -9.5, "field_rel_l2_mean": 0.017, "crps_mean": 0.005,
         "n_samples": 4, "backend": "tpu", "ensemble_var_mean": 2.0}
    r = compare(a, b)
    assert r["rows"]["test_bpd"]["verdict"] == "better"       # bpd down
    assert r["rows"]["field_rel_l2_mean"]["verdict"] == "worse"
    assert r["rows"]["crps_mean"]["verdict"] == ""            # unchanged
    assert r["rows"]["ensemble_var_mean"]["verdict"] == ""    # no direction
    assert any("n_samples" in m for m in r["context_mismatches"])

    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(_json.dumps(a))
    pb.write_text(_json.dumps(b))
    assert main([str(pa), str(pb)]) == 0
    out = capsys.readouterr().out
    assert "CONTEXT MISMATCH" in out and "1 better, 1 worse" in out


def test_inspect_data_handles_malformed_archives(tmp_path):
    """Review regressions: 4-D archives, swapped lf/hf grids, and
    empty (N=0) archives must produce reports, not tracebacks."""
    import numpy as np

    from tpuflow.data.dataset import save_archive
    from tpuflow.tools.inspect_data import inspect_archive, main

    # 4-D (missing trajectory axis): contract violation, no KeyError.
    p4 = tmp_path / "4d.npz"
    np.savez_compressed(p4, lf=np.zeros((4, 8, 16, 3), np.float32),
                        hf=np.zeros((4, 32, 64, 3), np.float32))
    rec = inspect_archive(p4)
    assert not rec["ok"] and "5-D" in rec["errors"][0]
    assert main([str(p4)]) == 1

    # Swapped lf/hf (HF grid smaller than LF): detected as a warning.
    ps = tmp_path / "swapped.npz"
    save_archive(ps, np.random.rand(1, 2, 16, 32, 3).astype(np.float32),
                 np.random.rand(1, 2, 8, 16, 3).astype(np.float32))
    rec = inspect_archive(ps, n_scales=3)
    assert any("swapped" in w for w in rec["warnings"])

    # Zero trajectories: contract error, no reduction-identity crash.
    pe = tmp_path / "empty.npz"
    save_archive(pe, np.zeros((0, 4, 8, 16, 3), np.float32),
                 np.zeros((0, 4, 32, 64, 3), np.float32))
    rec = inspect_archive(pe)
    assert not rec["ok"] and "empty" in rec["errors"][0]


def test_inspect_data_import_alien_layout(tmp_path, capsys):
    """--import ingests an archive with deliberately alien key names
    and layouts (VERDICT r1 item 10): torch-style channel-first LF
    under a nested h5 group, channels-last HF under an unrelated name,
    plus decoy datasets — and writes a contract-conformant archive."""
    import h5py
    import numpy as np

    from tpuflow.data import generate_case
    from tpuflow.data.dataset import load_archive
    from tpuflow.tools.inspect_data import import_alien, main

    lf, hf = generate_case("backward-step", 2, 6, (32, 64), (8, 16), seed=11)
    src = tmp_path / "zenodo_dump.h5"
    with h5py.File(src, "w") as f:
        g = f.create_group("solver/coarse_mesh")
        # channel-first torch convention (N, T, C, h, w)
        g.create_dataset("fields", data=np.moveaxis(lf, -1, 2))
        f.create_dataset("dns_reference_run", data=hf)
        f.create_dataset("time_values", data=np.arange(6.0))
        f.create_dataset("README", data=np.bytes_(b"not an array"))
        f.create_dataset("re_numbers", data=np.asarray([100.0, 200.0]))

    out = tmp_path / "backward-step_train.h5"
    rec = import_alien(src, out, n_scales=3)
    assert rec["ok"], rec
    assert rec["lf_key"] == "solver/coarse_mesh/fields"
    assert rec["hf_key"] == "dns_reference_run"
    assert "channel-first" in rec["lf_layout"]
    lf2, hf2 = load_archive(out)
    np.testing.assert_array_equal(lf2, lf)
    np.testing.assert_array_equal(hf2, hf)

    # CLI surface + printed decisions.
    assert main(["--import", str(src), "--out", str(tmp_path / "o.npz")]) == 0
    printed = capsys.readouterr().out
    assert "lf <- solver/coarse_mesh/fields" in printed

    # Single-trajectory 4-D arrays gain N=1.
    src4 = tmp_path / "single.npz"
    np.savez_compressed(src4, low_res=lf[0], high_res=hf[0])
    rec4 = import_alien(src4, tmp_path / "o4.npz")
    assert rec4["lf_shape"] == [1, 6, 8, 16, 3]

    # No plausible pair -> a report-worthy error, not a stack trace.
    bad = tmp_path / "bad.npz"
    np.savez_compressed(bad, a=np.zeros(7), b=np.zeros((3, 3)))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="plausible trajectory arrays"):
        import_alien(bad, tmp_path / "never.npz")


def test_compare_runs_rejects_unknown_flags(tmp_path):
    import pytest as _pytest

    from tpuflow.tools.compare_runs import main

    with _pytest.raises(SystemExit, match="unknown flag"):
        main(["a.json", "b.json", "--Json"])


# ------------------------------------------------------------------- doctor


def test_doctor_subprocess_runner():
    """_sub: success returns last stdout line; failures and timeouts
    are reported, never raised (a wedged probe must not hang/crash)."""
    from tpuflow.tools.doctor import _sub

    ok, out = _sub("print('a'); print('b')", timeout=30)
    assert ok and out == "b"
    ok, out = _sub("import sys; sys.exit(3)", timeout=30)
    assert not ok
    ok, out = _sub("raise ValueError('boom')", timeout=30)
    assert not ok and "boom" in out
    ok, out = _sub("import time; time.sleep(60)", timeout=1)
    assert not ok and "timed out" in out


def test_doctor_aggregation(monkeypatch, capsys):
    """A failed WARN-only check (wedged device probe) keeps the doctor
    healthy; a failed required check does not."""
    import tpuflow.tools.doctor as doc

    def fake_sub(code, timeout, env_extra=None):
        if "jax.devices" in code and "cpu" not in code:
            return False, "timed out after 5s"
        return True, "ok"

    monkeypatch.setattr(doc, "_sub", fake_sub)
    assert doc.main(["--probe-timeout=5"]) == 0
    out = capsys.readouterr().out
    assert "WARN device" in out and "doctor: healthy" in out

    def all_fail(code, timeout, env_extra=None):
        return False, "broken"

    monkeypatch.setattr(doc, "_sub", all_fail)
    assert doc.main([]) == 1
    assert "NOT healthy" in capsys.readouterr().out


@pytest.mark.slow  # 16-45s on the 1-core bench host
def test_sweep_members(tmp_path):
    """Throughput-vs-ensemble-width study runs on random init + synthetic
    LF input (no checkpoint/dataset), one JSON row per width, and writes
    members_sweep.json under the eval output dir."""
    import json

    from tpuflow.tools.sweep_members import main as sweep_main

    rows = sweep_main(
        [
            "backward-step",
            "members=1,2", "steps=3", "repeats=1",
            "model.n_scales=2", "model.n_flow_steps=2", "model.coupling_width=8",
            "model.coupling_layers=2", "model.growth_rate=4",
            "model.encoder_width=8", "model.lstm_hidden=8",
            "model.cond_channels=8",
            "model.hf_shape=16,32", "model.lf_shape=4,8",
            "model.use_pallas=false",
            f"eval.output_dir={tmp_path}/eval",
        ]
    )
    assert [r["members"] for r in rows] == [1, 2]
    for r in rows:
        assert r["steps_per_sec"] > 0
        assert r["member_steps_per_sec"] == pytest.approx(
            r["steps_per_sec"] * r["members"], rel=0.01
        )
    saved = json.loads(
        (tmp_path / "eval" / "backward-step" / "members_sweep.json").read_text()
    )
    assert saved == rows


@pytest.mark.slow  # 16-45s on the 1-core bench host
def test_probe_tau_stability_smoke(tmp_path):
    """The sampling-stability probe (PAPER_PARITY 'Sampling stability'
    measurement tool) runs untrained+synthetic at low tau: one row per
    (clip, tau, seed), finite at init, with the z_clip rows present."""
    from tpuflow.tools.probe_tau_stability import main as probe_main

    rows = probe_main(
        [
            "backward-step",
            "taus=0.5", "clips=0,3", "seeds=1",
            "model.n_scales=2", "model.n_flow_steps=2",
            "model.coupling_width=8", "model.coupling_layers=2",
            "model.growth_rate=4", "model.encoder_width=8",
            "model.lstm_hidden=8", "model.cond_channels=8",
            "model.hf_shape=16,32", "model.lf_shape=4,8",
            "model.use_pallas=false",
            "data.n_test_traj=1", "data.train_steps=6",
            "eval.n_samples=2", "eval.rollout_steps=4",
            "eval.allow_untrained=true",
        ]
    )
    assert [r["z_clip"] for r in rows] == [0.0, 3.0]
    for r in rows:
        assert r["first_nonfinite_step"] == -1  # finite at init
        assert len(r["max_abs_head"]) == 4


@pytest.mark.slow  # 16-45s on the 1-core bench host
def test_probe_width_smoke():
    """The coupling-width costing probe (r3 VERDICT weak item 4) runs a
    tiny model at two widths: param count grows with width, rates are
    positive, and dotted config overrides pass through to load_case."""
    from tpuflow.tools.probe_width import main as width_main

    rows = width_main(
        [
            "backward-step",
            "steps=2", "samples=2", "widths=8,16",
            "model.n_scales=2", "model.n_flow_steps=2",
            "model.coupling_layers=2", "model.growth_rate=4",
            "model.encoder_width=8", "model.lstm_hidden=8",
            "model.cond_channels=8",
            "model.hf_shape=16,32", "model.lf_shape=4,8",
            "model.use_pallas=false",
        ]
    )
    assert [r["coupling_width"] for r in rows] == [8, 16]
    assert rows[1]["n_params"] > rows[0]["n_params"]
    assert all(r["rollout_steps_per_sec"] > 0 for r in rows)
