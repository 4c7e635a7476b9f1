"""Held-out evaluation: test NLL + UQ physics statistics vs HF
reference (SURVEY.md §3.2 / L5; BASELINE config #4).

Usage: python -m tpuflow.cli.evaluate <case> [key=value ...]

Computes held-out bits/dim over the test split, runs an ensemble
rollout on each test trajectory, and reports TKE / moment / field
errors of the prediction against the HF reference, with figures.
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.cli import parse_args
from tpuflow.data.dataset import load_dataset
from tpuflow.eval.loading import load_eval_bundle
from tpuflow.eval.plots import plot_nll_curve, plot_tke
from tpuflow.eval.rollout import make_ensemble_rollout, make_nll_eval
from tpuflow.eval.stats import relative_l2, tke_field, total_variance


def main(argv=None) -> dict:
    cfg = parse_args(argv)
    model, variables, norm = load_eval_bundle(cfg)
    # Checkpoint normalization constants are authoritative at eval time.
    ds = load_dataset(cfg.data, cfg.model, "test", norm=norm)
    T = min(cfg.eval.rollout_steps, ds.n_steps)

    # Held-out NLL (teacher-forced forward direction).
    nll = jax.jit(make_nll_eval(model))
    bpds = nll(variables, jnp.asarray(ds.lf[:, :T]), jnp.asarray(ds.hf[:, :T]))
    bpd_per_step = np.asarray(bpds).mean(axis=1)

    # Ensemble rollout per test trajectory -> physics statistics.
    rollout = jax.jit(
        make_ensemble_rollout(
            model, cfg.eval.n_samples, cfg.eval.temperature, collect="stats"
        )
    )
    if ds.n_traj == 0:
        raise ValueError("test split is empty — nothing to evaluate")

    # Physics statistics are computed in PHYSICAL units (the dataset
    # holds normalized fields; per-channel sigma differs, so normalized
    # TKE would reweight u/v fluctuations — stats.py contract).
    tke_errs, mean_errs, var_mean = [], [], []
    tke_pred_sum = tke_ref_sum = None
    for i in range(ds.n_traj):
        out = rollout(
            variables, jnp.asarray(ds.lf[i, :T]), jax.random.PRNGKey(i)
        )
        mean = jnp.asarray(ds.denorm_hf(np.asarray(out["mean"])))
        var = jnp.asarray(ds.denorm_hf_var(np.asarray(out["var"])))
        hf = jnp.asarray(ds.denorm_hf(ds.hf[i, :T]))
        # Predicted turbulent fluctuation: pooled (time x ensemble)
        # variance vs the HF temporal variance (see stats.total_variance).
        tke_pred = tke_field(total_variance(mean, var))
        tke_ref = tke_field(hf.var(axis=0))
        tke_errs.append(float(relative_l2(tke_pred, tke_ref)))
        mean_errs.append(float(relative_l2(mean, hf)))
        var_mean.append(float(var.mean()))
        tke_pred_sum = tke_pred if tke_pred_sum is None else tke_pred_sum + tke_pred
        tke_ref_sum = tke_ref if tke_ref_sum is None else tke_ref_sum + tke_ref

    out_dir = pathlib.Path(cfg.eval.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)
    plot_nll_curve(out_dir, bpd_per_step)
    # Figure matches the metric: averaged over ALL test trajectories.
    plot_tke(
        out_dir,
        np.asarray(tke_pred_sum) / ds.n_traj,
        np.asarray(tke_ref_sum) / ds.n_traj,
    )

    metrics = {
        "test_bpd": float(np.mean(bpd_per_step)),
        "test_bpd_last_step": float(bpd_per_step[-1]),
        "tke_rel_l2_mean": float(np.mean(tke_errs)),
        "field_rel_l2_mean": float(np.mean(mean_errs)),
        "ensemble_var_mean": float(np.mean(var_mean)),
        "n_test_traj": ds.n_traj,
        "steps": T,
        "n_samples": cfg.eval.n_samples,
        "backend": jax.default_backend(),
    }
    (out_dir / "eval_metrics.json").write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
