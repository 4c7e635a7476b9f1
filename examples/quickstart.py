"""End-to-end tpuflow walkthrough on the procedural synthetic dataset.

Runs the full reference workflow (SURVEY.md §3: train -> checkpoint ->
ensemble rollout -> UQ statistics -> recalibration) in miniature, with
no downloads and no TPU required — a few minutes on CPU, seconds on a
chip. For the production-size runs, drop the size overrides (see
tpuflow/configs/cases/*.yaml for the real presets).

    python examples/quickstart.py [workdir]
"""

from __future__ import annotations

import json
import pathlib
import sys

from tpuflow.cli.evaluate import main as evaluate_main
from tpuflow.cli.rollout import main as rollout_main
from tpuflow.cli.train import main as train_main

workdir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "./quickstart_out")

# The case API: one positional case name + dotted overrides — identical
# to the CLI (`python -m tpuflow.cli.train backward-step key=value ...`).
small = [
    "backward-step",
    # Miniature model so CPU finishes in minutes (production preset:
    # remove these lines).
    "model.n_scales=2", "model.n_flow_steps=2", "model.coupling_width=8",
    "model.coupling_layers=2", "model.growth_rate=4",
    "model.encoder_width=8", "model.lstm_hidden=8", "model.cond_channels=8",
    "model.hf_shape=16,32", "model.lf_shape=4,8",
    # Miniature synthetic dataset (procedural — no Zenodo archives).
    "data.n_train_traj=8", "data.n_test_traj=4", "data.train_steps=8",
    "data.window=4", "data.batch_size=4",
    f"train.checkpoint_dir={workdir}/ckpt",
    f"eval.output_dir={workdir}/eval",
    "train.epochs=8", "train.checkpoint_every=4",
    "eval.rollout_steps=8", "eval.n_samples=8", "eval.calibration_steps=6",
]

print("== 1. Train (truncated-BPTT NLL, Adam + decay, Orbax checkpoints)")
train = train_main(small)
print(f"   final mean bits/dim: {train['mean_bpd']:.3f}")

print("== 2. Ensemble rollout (autoregressive lax.scan, O(1) memory)")
roll = rollout_main(small)
print(f"   {roll['rollout_steps_per_sec']:.2f} steps/s; "
      f"figures in {workdir}/eval/backward-step/")

print("== 3. Held-out evaluation (NLL, TKE, spectra, CRPS, coverage)")
ev = evaluate_main(small)
print(json.dumps({k: ev[k] for k in (
    "test_bpd", "field_rel_l2_mean", "tke_rel_l2_mean", "crps_mean",
    "spread_scale")}, indent=1))
print("   held-out coverage at nominal 0.50/0.80/0.90/0.95:")
for label, key in [
    ("raw ensemble   ", "coverage_holdout_raw"),
    ("single factor  ", "coverage_holdout_single_factor"),
    ("per-level recal", "coverage_holdout_per_level"),
]:
    vals = "/".join(f"{v:.2f}" for v in ev[key].values())
    print(f"     {label}: {vals}")

print("== 4. Deploy the fitted UQ recalibration for free")
# Separate output dir so step 2's raw stats/figures stay inspectable;
# physics TKE stays on raw variance, UQ surfaces get var_calibrated.
rollout_main(small + [
    f"eval.spread_scale={ev['spread_scale']}",
    f"eval.output_dir={workdir}/eval_recalibrated",
])
print(f"   recalibrated rollout stats written to eval_recalibrated/ "
      f"(var_calibrated = var x {ev['spread_scale']:.2f}^2)")

print("== 5. Consolidated report (tools/report.py)")
from tpuflow.tools.report import main as report_main

path = report_main(small)
print(f"   one-page markdown summary of the run: {path}")

print("== 6. Export + serve (StableHLO artifact, no model code needed)")
import jax
import numpy as np

from tpuflow.tools.export_rollout import main as export_main
from tpuflow.tools.serve import RolloutServer

# Lower for the backend this process will call it on (plus CPU, so the
# same file also serves off-chip) — a cpu-only artifact cannot execute
# on a TPU-default host and vice versa.
plats = "cpu" if jax.default_backend() == "cpu" else "tpu,cpu"
artifact = export_main(small + [f"export_platforms={plats}"])
server = RolloutServer(artifact)  # artifact + sidecar only
lf_shape = tuple(server.meta["lf_input_shape"])
stats = server.rollout(  # physical-unit request, normalized server-side
    np.zeros(lf_shape, np.float32), seed=0
)
print(f"   served ensemble mean {stats['mean'].shape} from {artifact.name} "
      "(tpuflow-serve http serves the same pair over HTTP); done.")
