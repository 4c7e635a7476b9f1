"""Sampling-temperature (tau) study: metrics vs temperature.

Parity+: arXiv:2006.04731 §4 selects tau = 0.7 by studying how the
sampling temperature trades sample diversity against accuracy; this
tool reproduces that study for any checkpoint — one compiled rollout
(temperature is a traced argument), swept over a tau grid, reporting
per-tau field error, TKE error, Gaussian CRPS, and ensemble spread,
with a summary figure.

The stats-mode sweep runs the full eval horizon; a second fields-mode
rollout on a short window (eval.calibration_steps) adds the
distribution-shape and stability columns the tau decision actually
needs (see docs/PAPER_PARITY.md "Sampling stability"):
  * finite_frac — fraction of member-field values that are finite
    (1.0 = stable; the tau >= 1.0 failure mode is member overflow)
  * pdf_w1_{u,v} — normalized fluctuation-PDF Wasserstein-1 vs the
    converged eval.ref_steps reference (the second-moment metric the
    reduced-tau ensemble loses to the bicubic baseline on)
  * tke_cal — TKE rel-L2 with disjoint-split spread calibration
    (fit on even trajectories, scored on odd — the deployment path)

Usage:
  python -m tpuflow.tools.sweep_temperature <case> \
      [temperatures=0.3,0.5,0.7,0.9,1.0] [key=value ...]
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np


def sweep(cfg, temperatures) -> list[dict]:
    """Run the study for one case config; returns per-tau metric rows."""
    from tpuflow.data.dataset import load_dataset
    from tpuflow.eval.loading import load_eval_bundle
    from tpuflow.eval.rollout import make_ensemble_rollout
    from tpuflow.eval.stats import (
        gaussian_crps,
        relative_l2,
        tke_field,
        total_variance,
    )

    model, variables, norm, ckpt_meta = load_eval_bundle(cfg)
    ds = load_dataset(cfg.data, cfg.model, "test", norm=norm)
    T = min(cfg.eval.rollout_steps, ds.n_steps)
    rollout = jax.jit(
        make_ensemble_rollout(
            model, cfg.eval.n_samples, collect="stats"
        )
    )
    # tau-independent per-trajectory reference prep, hoisted out of the
    # temperature loop: the denormalized HF field, its temporal TKE and
    # the LF input never change with tau — recomputing (and re-uploading)
    # them per tau multiplied sweep wall-clock by ~len(temperatures).
    lf_in = [jnp.asarray(ds.lf[i, :T]) for i in range(ds.n_traj)]
    hf_ref = [jnp.asarray(ds.denorm_hf(ds.hf[i, :T])) for i in range(ds.n_traj)]
    hf_tke = [tke_field(hf.var(axis=0)) for hf in hf_ref]

    # Second-moment / stability columns: a short fields-mode rollout
    # (memory O(t_cal * N * H * W * C)) scored against the converged
    # eval.ref_steps references, with disjoint-split spread
    # calibration — the tau-decision table in one tool.
    t_cal = min(cfg.eval.calibration_steps, T)
    shape_cols = t_cal >= 2 and cfg.eval.n_samples >= 2
    if shape_cols:
        from tpuflow.eval.calibrate import (
            fit_spread_scale,
            fit_variance_scale,
            scale_members,
        )
        from tpuflow.eval.stats import wasserstein1

        fields_rollout = jax.jit(
            make_ensemble_rollout(
                model, cfg.eval.n_samples, collect="fields"
            )
        )
        if cfg.data.synthetic and cfg.eval.ref_steps > t_cal:
            from tpuflow.data import generate_case

            _, hf_long = generate_case(
                cfg.data.case, ds.n_traj, cfg.eval.ref_steps,
                cfg.model.hf_shape, cfg.model.lf_shape,
                seed=cfg.data.seed + 10_000,
                fixture_version=cfg.data.fixture_version,
            )
            refs = [jnp.asarray(hf_long[i]) for i in range(ds.n_traj)]
        else:
            refs = [hf[:t_cal] for hf in hf_ref]
        fit_idx = list(range(0, ds.n_traj, 2))
        hold_idx = list(range(1, ds.n_traj, 2)) or fit_idx
        # With a single trajectory the holdout falls back to the fit
        # set; flag that in every row (r3 advisor finding) the same way
        # evaluate.py records calibration_in_sample.
        calib_in_sample = hold_idx == fit_idx

    rows = []
    for tau in temperatures:
        tke_errs, field_errs, crps_vals, spreads = [], [], [], []
        for i in range(ds.n_traj):
            out = rollout(
                variables,
                lf_in[i],
                jax.random.PRNGKey(i),
                jnp.float32(tau),
            )
            mean = jnp.asarray(ds.denorm_hf(np.asarray(out["mean"])))
            var = jnp.asarray(ds.denorm_hf_var(np.asarray(out["var"])))
            hf, ref_tke = hf_ref[i], hf_tke[i]
            tke_errs.append(
                float(
                    relative_l2(
                        tke_field(total_variance(mean, var)), ref_tke
                    )
                )
            )
            field_errs.append(float(relative_l2(mean, hf)))
            crps_vals.append(float(jnp.mean(gaussian_crps(mean, var, hf))))
            spreads.append(float(jnp.sqrt(var).mean()))
        row = {
            "temperature": float(tau),
            "field_rel_l2": float(np.mean(field_errs)),
            "tke_rel_l2": float(np.mean(tke_errs)),
            "gaussian_crps": float(np.mean(crps_vals)),
            "ensemble_std": float(np.mean(spreads)),
        }
        if shape_cols:
            members = {}
            finite = []
            for i in range(ds.n_traj):
                f = np.asarray(
                    fields_rollout(
                        variables,
                        lf_in[i][:t_cal],
                        jax.random.PRNGKey(100 + i),
                        jnp.float32(tau),
                    )
                )  # (t_cal, N, H, W, C) normalized
                finite.append(float(np.isfinite(f).mean()))
                members[i] = jnp.asarray(
                    np.moveaxis(ds.denorm_hf(f), 1, 0)
                )  # (N, t, H, W, C)
            row["finite_frac"] = float(np.mean(finite))
            if row["finite_frac"] == 1.0:
                scale = float(
                    np.mean([
                        float(fit_spread_scale(members[i], refs[i][:t_cal]))
                        for i in fit_idx
                    ])
                )
                row["spread_scale_fit"] = scale
                # Unbiased variance-statistic inflation (see
                # calibrate.fit_variance_scale_from_moments).
                v_scale = float(
                    np.mean([
                        float(
                            fit_variance_scale(members[i], refs[i][:t_cal])
                        )
                        for i in fit_idx
                    ])
                )
                row["variance_scale_fit"] = v_scale
                tke_cal, w1u, w1v = [], [], []
                for i in hold_idx:
                    m_cal = scale_members(members[i], v_scale)
                    ref_i = refs[i]
                    tke_cal.append(float(relative_l2(
                        tke_field(m_cal.var(axis=(0, 1))),
                        tke_field(ref_i.var(axis=0)),
                    )))
                    fl = m_cal[..., :2] - m_cal[..., :2].mean(
                        axis=(0, 1), keepdims=True
                    )
                    rfl = ref_i[..., :2] - ref_i[..., :2].mean(
                        0, keepdims=True
                    )
                    for c, acc in ((0, w1u), (1, w1v)):
                        acc.append(
                            float(wasserstein1(fl[..., c], rfl[..., c]))
                            / (float(jnp.std(rfl[..., c])) + 1e-12)
                        )
                row["tke_rel_l2_calibrated"] = float(np.mean(tke_cal))
                row["pdf_w1_u"] = float(np.mean(w1u))
                row["pdf_w1_v"] = float(np.mean(w1v))
                row["calibration_in_sample"] = calib_in_sample
        rows.append(row)
    return rows


def plot_sweep(out_dir, rows) -> pathlib.Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    taus = [r["temperature"] for r in rows]
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    for ax, key in zip(
        axes, ("field_rel_l2", "tke_rel_l2", "gaussian_crps")
    ):
        ax.plot(taus, [r[key] for r in rows], "o-")
        ax.set_xlabel("temperature tau")
        ax.set_ylabel(key)
        ax.grid(alpha=0.3)
    path = out_dir / "temperature_sweep.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def main(argv=None) -> list[dict]:
    from tpuflow.cli import parse_args

    argv = list(sys.argv[1:] if argv is None else argv)
    taus = (0.3, 0.5, 0.7, 0.9, 1.0)
    for a in list(argv):
        if a.startswith("temperatures="):
            taus = tuple(float(x) for x in a.split("=", 1)[1].split(","))
            argv.remove(a)
    cfg = parse_args(argv)
    rows = sweep(cfg, taus)
    out_dir = pathlib.Path(cfg.eval.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "temperature_sweep.json").write_text(json.dumps(rows, indent=2))
    plot_sweep(out_dir, rows)
    print(json.dumps(rows))
    return rows


if __name__ == "__main__":
    main()


from tpuflow.cli import as_console_script

cli = as_console_script(main)
