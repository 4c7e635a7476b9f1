"""Autoregressive ensemble rollout from a checkpoint (SURVEY.md §3.2;
BASELINE configs #1/#2/#4).

Usage: python -m tpuflow.cli.rollout <case> [key=value ...]

Rolls the model ``eval.rollout_steps`` steps with ``eval.n_samples``
ensemble members at ``eval.temperature`` over the first test-split LF
trajectory; writes ensemble statistics (.npz), prediction/TKE figures,
and throughput numbers (rollout steps/sec — the north-star metric) to
``eval.output_dir``.
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.cli import as_console_script, parse_args
from tpuflow.data.dataset import load_dataset
from tpuflow.eval.loading import load_eval_bundle
from tpuflow.eval.plots import (
    plot_prediction_panels,
    plot_probe_timeseries,
    plot_profiles,
    plot_samples_grid,
    plot_tke,
    plot_vorticity,
)
from tpuflow.eval.rollout import make_ensemble_rollout
from tpuflow.eval.stats import tke_field, total_variance, vorticity
from tpuflow.utils.profiling import step_timer


def main(argv=None) -> dict:
    cfg = parse_args(argv)
    model, variables, norm, ckpt_meta = load_eval_bundle(cfg)
    # Deployed sampling temperature: explicit per-scale override >
    # fine-tuned learned_tau in the checkpoint > scalar (loading.py).
    from tpuflow.eval.loading import resolve_temperature

    temperature = resolve_temperature(cfg, ckpt_meta)
    # The checkpoint's stored normalization constants are authoritative
    # (a converted/real checkpoint may have been trained with different
    # statistics than this machine's dataset would recompute).
    ds = load_dataset(cfg.data, cfg.model, "test", norm=norm)
    T = cfg.eval.rollout_steps
    n_avail = ds.n_steps
    # Horizons beyond the stored trajectory wrap-tile the LF INPUT only
    # (periodic replay conditioning for long-horizon throughput runs,
    # BASELINE stretch config #5). The HF reference is never tiled:
    # replayed frames would double-count the early transient in the
    # temporal-variance TKE and label old frames "HF target" in the
    # comparison panels — so every reference-vs-prediction figure and
    # statistic below is truncated to the t_ref genuine frames.
    if T > n_avail:
        reps = -(-T // n_avail)
        lf_traj = np.concatenate([ds.lf[0]] * reps, axis=0)[:T]
        print(f"note: rollout horizon {T} > stored {n_avail} steps; "
              "LF input wrap-tiled, HF comparisons use the first "
              f"{n_avail} genuine frames")
    else:
        lf_traj = ds.lf[0, :T]
    t_ref = min(T, n_avail)
    hf_traj = ds.hf[0, :t_ref]

    # Multi-device hosts: shard the ensemble across all chips (zero
    # communication); single-device (the common 1-chip case) runs flat.
    mesh = None
    if len(jax.devices()) > 1 and cfg.eval.n_samples % len(jax.devices()) == 0:
        from tpuflow.train.mesh import make_mesh

        mesh = make_mesh(data=1, ensemble=len(jax.devices()))
    rollout = jax.jit(
        make_ensemble_rollout(
            model, cfg.eval.n_samples, temperature,
            collect="stats", mesh=mesh,
            overflow_redraw=cfg.eval.overflow_redraw,
        )
    )
    # Compile once, then time the real run (force_completion, not
    # block_until_ready: the latter returns early through tunneled
    # backends and shifts the async compile into the timed region —
    # measured 0.2-17 "steps/s" for a 108-steps/s rollout).
    from tpuflow.utils.profiling import force_completion

    lf_dev = jnp.asarray(lf_traj)
    out = rollout(variables, lf_dev, jax.random.PRNGKey(0))
    force_completion(out)
    metrics: dict = {}
    from tpuflow.utils.profiling import trace_context

    with trace_context(cfg.eval.trace_dir or None):
        with step_timer(metrics, "rollout_steps_per_sec", n_items=T) as sync:
            out = rollout(variables, lf_dev, jax.random.PRNGKey(1))
            sync.append(out)

    out_dir = pathlib.Path(cfg.eval.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)
    # Physics statistics and figures in PHYSICAL units (stats.py
    # contract); the dataset holds normalized fields.
    mean = ds.denorm_hf(np.asarray(out["mean"]))
    var = ds.denorm_hf_var(np.asarray(out["var"]))
    # Post-hoc UQ recalibration (eval/calibrate.py): mean-preserving
    # spread inflation fitted by cli/evaluate.py. It applies to the
    # PREDICTIVE-uncertainty surfaces only (variance maps, +-2sigma
    # profiles, saved var_calibrated); physics statistics (TKE) stay on
    # the raw ensemble variance — the model's turbulent fluctuation is
    # a physical quantity, not an uncertainty estimate.
    if cfg.eval.spread_field:
        # Per-location inflation field (calibrate.py) beats the scalar
        # when set — same deployment contract, structured factors.
        s_field = np.load(cfg.eval.spread_field)
        if s_field.shape != var.shape[-3:]:
            raise ValueError(
                f"eval.spread_field shape {s_field.shape} does not match "
                f"the (H, W, C) field shape {var.shape[-3:]}"
            )
        var_cal = var * s_field**2
    else:
        var_cal = var * cfg.eval.spread_scale**2
    hf_phys = ds.denorm_hf(hf_traj)
    lf_phys = ds.denorm_lf(lf_traj)
    stats_out = {"mean": mean, "var": var}
    if cfg.eval.spread_field or cfg.eval.spread_scale != 1.0:
        stats_out["var_calibrated"] = var_cal
    np.savez_compressed(out_dir / "rollout_stats.npz", **stats_out)

    # Reference-vs-prediction outputs stay within the genuine frames.
    for t in sorted({0, t_ref // 2, t_ref - 1}):
        plot_prediction_panels(
            out_dir, lf_phys[t], hf_phys[t], mean[t], var_cal[t], t
        )
    tke_pred = np.asarray(tke_field(total_variance(
        jnp.asarray(mean[:t_ref]), jnp.asarray(var[:t_ref])
    )))
    plot_tke(out_dir, tke_pred, np.asarray(tke_field(jnp.asarray(hf_phys.var(axis=0)))))
    t_mid = t_ref // 2
    plot_profiles(
        out_dir, mean[t_mid], np.sqrt(var_cal[t_mid]), hf_phys[t_mid]
    )
    plot_probe_timeseries(
        out_dir, mean[:t_ref], np.sqrt(var_cal[:t_ref]), hf_phys
    )
    gh, gw = cfg.model.hf_shape
    dx, dy = cfg.data.domain_x / gw, cfg.data.domain_y / gh
    plot_vorticity(
        out_dir,
        np.asarray(vorticity(jnp.asarray(mean[t_ref - 1]), dx=dx, dy=dy)),
        np.asarray(vorticity(jnp.asarray(hf_phys[t_ref - 1]), dx=dx, dy=dy)),
        t=t_ref - 1,
    )

    # Individual member samples (small fields-mode rollout to t_mid+1).
    n_show = min(8, cfg.eval.n_samples)
    fields_fn = jax.jit(
        make_ensemble_rollout(
            model, n_show, temperature, "fields",
            overflow_redraw=cfg.eval.overflow_redraw,
        )
    )
    fields = fields_fn(
        variables, jnp.asarray(lf_traj[: t_mid + 1]), jax.random.PRNGKey(2)
    )
    plot_samples_grid(
        out_dir, ds.denorm_hf(np.asarray(fields[-1])), hf_phys[t_mid], t_mid
    )

    metrics.update(
        steps=T,
        n_samples=cfg.eval.n_samples,
        # Per-scale (fine-tuned/overridden) taus serialize as a list.
        temperature=(
            float(temperature) if np.ndim(temperature) == 0
            else [float(t) for t in np.asarray(temperature)]
        ),
        backend=jax.default_backend(),
    )
    (out_dir / "rollout_metrics.json").write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()


cli = as_console_script(main)
