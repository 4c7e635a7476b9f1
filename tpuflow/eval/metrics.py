"""Evaluation metric families (extracted from cli/evaluate.py).

VERDICT r3 weak #3: the evaluator's metric orchestration lived in one
773-line ``main()``. This module owns the tested, unit-callable
pieces; ``cli/evaluate.py`` is the thin orchestration that sequences
them. Behavior contract: eval_metrics.json is pinned by the COMMITTED
regression oracle — tests/test_eval_oracle.py re-derives
``runs/r5_eval_oracle`` with the current evaluator and diffs the JSON
(tolerance-zero key set, tight float tolerance); regenerate with
``python -m tpuflow.tools.make_eval_oracle``.

Families:
  * rollout_test_split — batched stats-mode rollout over the split
  * long_reference — converged variance references (eval.ref_steps)
  * per_trajectory_metrics — field/TKE/vorticity/divergence + baseline
  * members_fn_factory — physical-unit fields-mode member loader
  * shape_metrics_traj0 — CRPS/coverage/spectra/PDF/moments (traj 0)
  * fit_calibration_artifacts — every deployable calibration fit
    (scalar spread, per-location field, per-level intervals, variance
    factor, pooled + streamwise-stratified quantile maps)
  * score_holdout — second-moment + coverage scoring on the holdout
    split under raw/calibrated/field/qmap dispersion
  * calibration_metric_rows — the flat metrics-dict rows
"""

from __future__ import annotations

import pathlib
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.eval.baseline import lf_upsample, skill
from tpuflow.eval.calibrate import (
    apply_lf_conditioned_qmap,
    apply_spectral_filter,
    fit_spectral_filter,
    apply_quantile_map,
    apply_quantile_map_stratified,
    fit_lf_conditioned_qmap,
    ensemble_zscores,
    fit_interval_scales_from_z,
    fit_quantile_map,
    fit_quantile_map_stratified,
    fit_spread_field_from_z,
    fit_spread_scale_from_z,
    fit_variance_scale_from_moments,
    scale_members,
    scaled_interval_coverage,
)
from tpuflow.eval.plots import (
    plot_energy_spectrum,
    plot_fluctuation_pdf,
    plot_reliability,
)
from tpuflow.eval.rollout import make_ensemble_rollout
from tpuflow.eval.stats import (
    divergence,
    energy_spectrum,
    ensemble_coverage,
    ensemble_crps,
    fluctuation_pdf,
    relative_l2,
    reynolds_stress_uv,
    tke_field,
    total_variance,
    velocity_moments,
    vorticity,
    wasserstein1,
)

COVERAGE_LEVELS = (0.5, 0.8, 0.9, 0.95)


def long_reference(cfg, ds, T: int):
    """Converged variance-statistic references (eval.ref_steps; see the
    config docstring for the sampling-noise motivation). Returns
    (hf_ref_long or None, ref_steps actually used)."""
    ref_steps = cfg.eval.ref_steps
    if cfg.data.synthetic and ref_steps > T:
        from tpuflow.data import generate_case

        _, hf_long = generate_case(
            cfg.data.case, ds.n_traj, ref_steps,
            cfg.model.hf_shape, cfg.model.lf_shape,
            seed=cfg.data.seed + 10_000,
            fixture_version=cfg.data.fixture_version,
        )
        # The generator emits PHYSICAL units (load_dataset's test split
        # is the same call, then normalized; denorm round-trips it).
        return hf_long, ref_steps
    return None, T


def per_trajectory_metrics(cfg, ds, means, vars_, hf_ref_long, T: int) -> dict:
    """Whole-horizon per-trajectory physics metrics + baseline
    comparators, in PHYSICAL units. Returns lists keyed per family
    plus figure payloads (tke sums, vorticity panel)."""
    tke_errs, mean_errs, var_mean, vort_errs = [], [], [], []
    div_rms_pred, div_rms_ref, vort_rms_ref = [], [], []
    base_field_errs, base_tke_errs, base_vort_errs = [], [], []
    tke_pred_sum = tke_ref_sum = None
    vort_fig = None
    for i in range(ds.n_traj):
        mean = jnp.asarray(ds.denorm_hf(means[i]))
        var = jnp.asarray(ds.denorm_hf_var(vars_[i]))
        hf = jnp.asarray(ds.denorm_hf(ds.hf[i, :T]))
        # Trivial-baseline comparator (eval/baseline.py): bicubic
        # LF->HF upsampling scored on the identical metrics.
        lf_up = lf_upsample(
            jnp.asarray(ds.denorm_lf(ds.lf[i, :T])), cfg.model.hf_shape
        )
        # Predicted turbulent fluctuation: pooled (time x ensemble)
        # variance vs the HF temporal variance (see stats.total_variance).
        # The ensemble-variance term deploys with the configured spread
        # calibration (eval.spread_scale, fit on a DISJOINT split by a
        # previous evaluate run — eval/calibrate.py); 1.0 = raw. The
        # in-eval fit/holdout calibrated metrics below never use this
        # knob, so setting it from this same eval cannot leak.
        s2 = cfg.eval.spread_scale ** 2
        tke_pred = tke_field(total_variance(mean, var * s2))
        hf_ref_i = (
            jnp.asarray(hf_ref_long[i]) if hf_ref_long is not None else hf
        )
        tke_ref = tke_field(hf_ref_i.var(axis=0))
        tke_errs.append(float(relative_l2(tke_pred, tke_ref)))
        mean_errs.append(float(relative_l2(mean, hf)))
        var_mean.append(float(var.mean()))
        base_field_errs.append(float(relative_l2(lf_up, hf)))
        base_tke_errs.append(
            float(relative_l2(tke_field(lf_up.var(axis=0)), tke_ref))
        )
        # Instantaneous vorticity of the ensemble-mean prediction vs HF
        # over the whole horizon (the reference's cylinder-array contour
        # comparison, arXiv:2006.04731 §4, as a scalar error norm).
        gh, gw = cfg.model.hf_shape
        dx, dy = cfg.data.domain_x / gw, cfg.data.domain_y / gh
        vort_pred = vorticity(mean, dx=dx, dy=dy)
        vort_ref = vorticity(hf, dx=dx, dy=dy)
        vort_errs.append(float(relative_l2(vort_pred, vort_ref)))
        base_vort_errs.append(
            float(relative_l2(vorticity(lf_up, dx=dx, dy=dy), vort_ref))
        )
        # Incompressibility diagnostic: RMS divergence of the predicted
        # mean vs the HF reference's own RMS on the same grid/stencil
        # (neither is exactly solenoidal after grid interpolation — the
        # honest scalar is the ratio, ~1 = as divergence-free as data).
        # CAVEAT: a streamfunction-built reference (cylinder-array
        # fixture) is solenoidal to machine precision, so the ratio
        # explodes on ANY finite prediction divergence; the
        # gradient-normalized divergence below (pred div RMS / ref
        # vorticity RMS — same derivative order and units) is the
        # scale-meaningful diagnostic for such cases.
        div_rms_pred.append(
            float(jnp.sqrt(jnp.mean(divergence(mean, dx=dx, dy=dy) ** 2)))
        )
        div_rms_ref.append(
            float(jnp.sqrt(jnp.mean(divergence(hf, dx=dx, dy=dy) ** 2)))
        )
        vort_rms_ref.append(float(jnp.sqrt(jnp.mean(vort_ref ** 2))))
        if i == 0:
            vort_fig = (np.asarray(vort_pred[T - 1]), np.asarray(vort_ref[T - 1]))
        tke_pred_sum = tke_pred if tke_pred_sum is None else tke_pred_sum + tke_pred
        tke_ref_sum = tke_ref if tke_ref_sum is None else tke_ref_sum + tke_ref
    return {
        "tke_errs": tke_errs,
        "mean_errs": mean_errs,
        "var_mean": var_mean,
        "vort_errs": vort_errs,
        "div_rms_pred": div_rms_pred,
        "div_rms_ref": div_rms_ref,
        "vort_rms_ref": vort_rms_ref,
        "base_field_errs": base_field_errs,
        "base_tke_errs": base_tke_errs,
        "base_vort_errs": base_vort_errs,
        "tke_pred_sum": tke_pred_sum,
        "tke_ref_sum": tke_ref_sum,
        "vort_fig": vort_fig,
    }


def members_fn_factory(
    model, variables, ds, t_cal: int, n_samples: int, temperature,
    overflow_redraw: bool = False,
) -> Callable:
    """Physical-unit ensemble members (N, T, H, W, C) + HF reference
    (T, H, W, C) for one test trajectory (fields-mode rollout, jitted
    once)."""
    fields_rollout = jax.jit(
        make_ensemble_rollout(
            model, n_samples, temperature, collect="fields",
            overflow_redraw=overflow_redraw,
        )
    )

    def _members_for(traj_i: int):
        f = np.asarray(
            fields_rollout(
                variables,
                jnp.asarray(ds.lf[traj_i, :t_cal]),
                jax.random.PRNGKey(traj_i),
            )
        )  # (T, N, H, W, C) normalized
        m = jnp.asarray(np.moveaxis(ds.denorm_hf(f), 1, 0))
        return m, jnp.asarray(ds.denorm_hf(ds.hf[traj_i, :t_cal]))

    return _members_for


def shape_metrics_traj0(
    cfg, ds, members, hf0, hf_ref_long, t_cal: int, out_dir: pathlib.Path
) -> dict:
    """CRPS/coverage/spectra/fluctuation-PDF/moment metrics on the
    first test trajectory + their figures. Returns the calib dict."""
    crps = ensemble_crps(members, jnp.asarray(hf0))
    coverage = ensemble_coverage(
        members, jnp.asarray(hf0), levels=COVERAGE_LEVELS
    )
    # Spectra of velocity fluctuations (time-mean flow removed);
    # predicted spectrum averages over time AND ensemble members.
    # Binned by PHYSICAL wavenumber (the domains are 4:1) with a
    # Hann taper (non-periodic flow: no boundary-jump leakage
    # floor) — definition changed 2026-08-18; earlier recorded
    # spectrum_rel_l2 values used index-space bins, no taper.
    pred_fluct = members[..., :2] - members[..., :2].mean(
        axis=(0, 1), keepdims=True
    )
    hf0_ref = (
        jnp.asarray(hf_ref_long[0]) if hf_ref_long is not None else hf0
    )
    ref_fluct = jnp.asarray(
        hf0_ref[..., :2] - hf0_ref[..., :2].mean(0, keepdims=True)
    )
    spec_domain = (cfg.data.domain_y, cfg.data.domain_x)
    k_bins, e_pred = energy_spectrum(pred_fluct, spec_domain, taper=True)
    _, e_ref = energy_spectrum(ref_fluct, spec_domain, taper=True)
    # Baseline fluctuation statistics on the same trajectory/horizon.
    lf_up0 = lf_upsample(
        jnp.asarray(ds.denorm_lf(ds.lf[0, :t_cal])), cfg.model.hf_shape
    )
    base_fluct = lf_up0[..., :2] - lf_up0[..., :2].mean(0, keepdims=True)
    _, e_base = energy_spectrum(base_fluct, spec_domain, taper=True)
    plot_energy_spectrum(
        out_dir, np.asarray(k_bins), np.asarray(e_pred), np.asarray(e_ref)
    )
    plot_reliability(
        out_dir, np.asarray(COVERAGE_LEVELS), np.asarray(coverage)
    )
    # Velocity-fluctuation PDFs (the reference's PDF comparison
    # figure, arXiv:2006.04731 §4) + a scalar transport distance:
    # Wasserstein-1 between the pooled predicted and HF fluctuation
    # distributions per velocity channel, normalized by the HF
    # channel std so the number is scale-free across cases.
    pdf_w1 = {}
    pdf_centers, pdf_pred, pdf_ref = [], [], []
    for c, name in enumerate(("u", "v")):
        pf, rf = pred_fluct[..., c], ref_fluct[..., c]
        ref_std = float(jnp.std(rf)) + 1e-12
        pdf_w1[f"pdf_w1_{name}"] = float(wasserstein1(pf, rf)) / ref_std
        pdf_w1[f"baseline_pdf_w1_{name}"] = (
            float(wasserstein1(base_fluct[..., c], rf)) / ref_std
        )
        lo = float(min(pf.min(), rf.min()))
        hi = float(max(pf.max(), rf.max()))
        centers, dp = fluctuation_pdf(pf, lo=lo, hi=hi)
        _, dr = fluctuation_pdf(rf, lo=lo, hi=hi)
        pdf_centers.append(np.asarray(centers))
        pdf_pred.append(np.asarray(dp))
        pdf_ref.append(np.asarray(dr))
    plot_fluctuation_pdf(
        out_dir, np.stack(pdf_centers), np.stack(pdf_pred),
        np.stack(pdf_ref),
    )
    calib = {
        **pdf_w1,
        "crps_mean": float(np.mean(np.asarray(crps))),
        "coverage": {
            f"{q:.2f}": float(c)
            for q, c in zip(COVERAGE_LEVELS, np.asarray(coverage))
        },
        "spectrum_rel_l2": float(
            relative_l2(jnp.log(e_pred[1:] + 1e-20), jnp.log(e_ref[1:] + 1e-20))
        ),
        "baseline_spectrum_rel_l2": float(
            relative_l2(jnp.log(e_base[1:] + 1e-20), jnp.log(e_ref[1:] + 1e-20))
        ),
        "calibration_steps": t_cal,
    }
    # Higher velocity moments (the reference's moment curves,
    # arXiv:2006.04731 §4): predicted (ensemble x time) skewness /
    # kurtosis fields vs the HF temporal ones, velocity channels
    # only. Mean absolute error (skew is signed around 0, so a
    # relative norm is ill-posed).
    mom_pred = velocity_moments(members[..., :2], axes=(0, 1))
    mom_ref = velocity_moments(hf0[..., :2], axes=(0,))
    calib["skew_mae"] = float(
        jnp.abs(mom_pred["skew"] - mom_ref["skew"]).mean()
    )
    calib["kurt_mae"] = float(
        jnp.abs(mom_pred["kurt"] - mom_ref["kurt"]).mean()
    )
    # Reynolds shear stress <u'v'> (the off-diagonal second moment;
    # TKE above is the diagonal): predicted ensemble x time
    # covariance field vs the HF temporal one.
    calib["reynolds_uv_rel_l2"] = float(
        relative_l2(
            reynolds_stress_uv(members, axes=(0, 1)),
            reynolds_stress_uv(hf0, axes=(0,)),
        )
    )
    return calib


def fit_calibration_artifacts(
    cfg, ds, members0, hf0, members_fn, hf_ref_long, fit_idx,
    out_dir: pathlib.Path,
) -> dict:
    """Fit every deployable calibration on the fit split (streaming:
    one trajectory's member fields live at a time — see the pooling
    note in cli/evaluate.py history). Saves spread_field.npy and
    quantile_map.npz; returns the fitted objects."""
    z_pool = []
    r2_parts, v_parts = [], []
    qmap_pred, qmap_ref = {0: [], 1: []}, {0: [], 1: []}
    qmap_pred_x, qmap_ref_x = {0: [], 1: []}, {0: [], 1: []}
    lf_stds = {0: [], 1: []}
    spec_domain = (cfg.data.domain_y, cfg.data.domain_x)
    e_m_parts, e_r_parts, spec_k = [], [], None
    for i in fit_idx:
        m_i, hf_i = (members0, hf0) if i == 0 else members_fn(i)
        # Keep the FIELD structure (T, H, W, C): the scalar and
        # interval fits ravel below; the per-location field fit
        # needs the spatial axes.
        z_pool.append(np.asarray(ensemble_zscores(m_i, hf_i)))
        # Raw second moments for the VARIANCE-statistic fit
        # (calibrate.fit_variance_scale_from_moments): equal
        # element counts per trajectory, so equal-weight means
        # pool exactly.
        r2_parts.append(float(jnp.mean((hf_i - m_i.mean(axis=0)) ** 2)))
        v_parts.append(float(jnp.mean(m_i.var(axis=0))))
        # Subsampled fluctuation marginals for the quantile-map
        # (distribution-shape) fit — member fluctuations vs the
        # CONVERGED reference's, per velocity channel. Stride-7
        # subsampling bounds pooled memory; quantiles at 65 knots
        # are insensitive to it. The stride is COPRIME with every
        # shipped grid dimension (64/96/128 are all divisible by 8, so
        # the earlier stride-8 'subsample' aliased onto fixed spatial
        # columns/rows — a spatially biased marginal in exactly the
        # streamwise-nonstationary flows the map corrects; r3 advisor
        # finding).
        fl_m = m_i[..., :2] - m_i[..., :2].mean(
            axis=(0, 1), keepdims=True
        )
        ref_q_i = (
            jnp.asarray(hf_ref_long[i])
            if hf_ref_long is not None
            else hf_i
        )
        fl_r = ref_q_i[..., :2] - ref_q_i[..., :2].mean(
            0, keepdims=True
        )
        # Pooled fluctuation spectra for the spectral calibration
        # filter (calibrate.fit_spectral_filter): member vs converged
        # reference, physical bins + taper (the eval definition).
        spec_k, e_m_i = energy_spectrum(fl_m, spec_domain, taper=True)
        _, e_r_i = energy_spectrum(fl_r, spec_domain, taper=True)
        e_m_parts.append(np.asarray(e_m_i))
        e_r_parts.append(np.asarray(e_r_i))
        # LF fluctuation stds for the LF-conditioned self-calibration
        # (calibrate.fit_lf_conditioned_qmap): deploy-available scale
        # covariate per trajectory.
        t_cal_i = fl_m.shape[1]
        lf_up_fit = lf_upsample(
            jnp.asarray(ds.denorm_lf(ds.lf[i, :t_cal_i])),
            cfg.model.hf_shape,
        )
        lf_fl_fit = lf_up_fit[..., :2] - lf_up_fit[..., :2].mean(
            0, keepdims=True
        )
        for c in (0, 1):
            lf_stds[c].append(float(jnp.std(lf_fl_fit[..., c])))
            qmap_pred[c].append(
                np.asarray(fl_m[..., c]).ravel()[::7]
            )
            qmap_ref[c].append(np.asarray(fl_r[..., c]).ravel()[::7])
            # Streamwise-stratified samples (x-column strata) for
            # the per-stratum maps: (W, pooled-over-N/T/H).
            w_ax_m = np.moveaxis(np.asarray(fl_m[..., c]), -1, 0)
            qmap_pred_x[c].append(
                w_ax_m.reshape(w_ax_m.shape[0], -1)[:, ::7]
            )
            w_ax_r = np.moveaxis(np.asarray(fl_r[..., c]), -1, 0)
            qmap_ref_x[c].append(
                w_ax_r.reshape(w_ax_r.shape[0], -1)
            )
        del m_i, fl_m, fl_r
    z_fields = jnp.asarray(np.concatenate(z_pool, axis=0))
    del z_pool
    z_f = z_fields.ravel()
    scale = fit_spread_scale_from_z(z_f)
    # Per-location inflation field (calibrate.py): fixes the spread
    # map's spatial structure, not just its magnitude; shrunk
    # toward the scalar fit and clipped (degenerate masked points).
    s_field = fit_spread_field_from_z(z_fields)
    del z_fields
    # Deployable artifact: cli/rollout consumes it via
    # eval.spread_field=<path> (var * s_field^2).
    np.save(out_dir / "spread_field.npy", np.asarray(s_field))
    # Per-level interval recalibration: one spread factor only
    # calibrates every level for Gaussian z; measured residuals are
    # heavy-tailed, so each level gets its own factor s_q (fit on
    # the fit split, applied to the holdout's two-moment stats).
    iscales = fit_interval_scales_from_z(z_f, levels=COVERAGE_LEVELS)
    del z_f
    # Variance-statistic inflation, fit unbiased from pooled raw
    # moments (NOT the z-RMS interval factor, whose 1/chi^2 tail
    # over-disperses pooled variances ~5x at N=4 — see
    # calibrate.fit_variance_scale_from_moments).
    var_factor = float(
        fit_variance_scale_from_moments(
            float(np.mean(r2_parts)), float(np.mean(v_parts)),
            cfg.eval.n_samples,
        )
    )
    # Distribution-shape calibration (calibrate.fit_quantile_map):
    # per-channel monotone map from the raw member fluctuation
    # marginal onto the converged reference's, fit on the fit
    # split, scored on holdout, saved as a deployable artifact.
    qmaps = {
        c: fit_quantile_map(
            jnp.asarray(np.concatenate(qmap_pred[c])),
            jnp.asarray(np.concatenate(qmap_ref[c])),
        )
        for c in (0, 1)
    }
    # Streamwise-stratified maps (one per x-column): corrects
    # mixture-of-strata marginals a pooled map cannot (see
    # calibrate.fit_quantile_map_stratified).
    qmaps_x = {
        c: fit_quantile_map_stratified(
            jnp.asarray(np.concatenate(qmap_pred_x[c], axis=1)),
            jnp.asarray(np.concatenate(qmap_ref_x[c], axis=1)),
        )
        for c in (0, 1)
    }
    # LF-conditioned self-calibrating shape maps (VERDICT r3 item 6):
    # one pooled map over per-trajectory SELF-STANDARDIZED marginals +
    # a target scale regressed on the trajectory's own LF fluctuation
    # std — transfers across the non-stationary v' marginal where the
    # global maps do not, and deploys with no reference data.
    qmaps_lf = {
        c: fit_lf_conditioned_qmap(
            qmap_pred[c], qmap_ref[c], lf_stds[c]
        )
        for c in (0, 1)
    }
    # Spectral calibration filter: radial S(k) = sqrt(E_ref/E_model)
    # fit from the pooled fit-split spectra; the deployed chain is
    # filter-then-variance-scale, so the variance factor for that
    # chain is REFIT from the filtered members' moments (the filter
    # changes the noise share of the ensemble variance).
    spec_filter = fit_spectral_filter(
        jnp.asarray(np.mean(e_m_parts, axis=0)),
        jnp.asarray(np.mean(e_r_parts, axis=0)),
        jnp.asarray(spec_k),
    )
    r2f_parts, vf_parts = [], []
    for i in fit_idx:
        m_i, hf_i = (members0, hf0) if i == 0 else members_fn(i)
        m_f = apply_spectral_filter(m_i, *spec_filter, spec_domain)
        r2f_parts.append(float(jnp.mean((hf_i - m_f.mean(axis=0)) ** 2)))
        vf_parts.append(float(jnp.mean(m_f.var(axis=0))))
        del m_i, m_f
    var_factor_sf = float(
        fit_variance_scale_from_moments(
            float(np.mean(r2f_parts)), float(np.mean(vf_parts)),
            cfg.eval.n_samples,
        )
    )
    np.savez(
        out_dir / "spectral_filter.npz",
        k=np.asarray(spec_filter[0]),
        s=np.asarray(spec_filter[1]),
        variance_scale=var_factor_sf,
        domain=np.asarray(spec_domain),
    )
    np.savez(
        out_dir / "quantile_map.npz",
        **{
            f"{ax}{c}": np.asarray(arr)
            for c, (xq, yq) in qmaps.items()
            for ax, arr in (("x", xq), ("y", yq))
        },
        **{
            f"s{ax}{c}": np.asarray(arr)
            for c, (xq, yq) in qmaps_x.items()
            for ax, arr in (("x", xq), ("y", yq))
        },
        **{
            f"l{ax}{c}": np.asarray(arr)
            for c, (xq, yq, _a) in qmaps_lf.items()
            for ax, arr in (("x", xq), ("y", yq))
        },
        **{
            f"lalpha{c}": np.asarray(a)
            for c, (_x, _y, a) in qmaps_lf.items()
        },
    )
    return {
        "scale": scale,
        "s_field": s_field,
        "iscales": iscales,
        "var_factor": var_factor,
        "qmaps": qmaps,
        "qmaps_x": qmaps_x,
        "qmaps_lf": qmaps_lf,
        "spec_filter": spec_filter,
        "var_factor_sf": var_factor_sf,
        "spec_domain": spec_domain,
    }


def score_holdout(
    cfg, ds, members0, hf0, members_fn, hf_ref_long, report_idx,
    fits: dict, t_cal: int,
) -> dict:
    """Second-moment physics + coverage/CRPS on the holdout
    trajectories under every dispersion treatment: raw ensemble,
    variance-calibrated, per-location field, quantile maps, and the
    bicubic baseline (identical t_cal horizon)."""
    scale = fits["scale"]
    s_field = fits["s_field"]
    iscales = fits["iscales"]
    var_factor = fits["var_factor"]
    qmaps, qmaps_x = fits["qmaps"], fits["qmaps_x"]

    cov_raw = cov_cal = cov_fld = cov_q = cov_s1 = 0.0
    crps_raw = crps_cal = crps_fld = 0.0
    sm = {
        k: 0.0
        for k in (
            "tke_raw", "tke_cal", "tke_fld", "tke_sfc", "tke_base",
            "rey_raw", "rey_cal", "rey_fld", "rey_sfc", "rey_base",
            "w1u_raw", "w1u_cal", "w1u_fld", "w1u_sfc", "w1u_qmap",
            "w1u_qmapx", "w1u_qmaplf", "w1u_base",
            "w1v_raw", "w1v_cal", "w1v_fld", "w1v_sfc", "w1v_qmap",
            "w1v_qmapx", "w1v_qmaplf", "w1v_base",
            "spec_raw", "spec_sfc", "spec_base",
        )
    }
    spec_domain = fits["spec_domain"]
    for i in report_idx:
        m_i, hf_i = (members0, hf0) if i == 0 else members_fn(i)
        m_cal = scale_members(m_i, scale)
        m_fld = scale_members(m_i, s_field)
        # Variance statistics use the unbiased variance-fit factor
        # (calibrate.fit_variance_scale_from_moments): the
        # interval-fit factor over-disperses pooled variances at
        # small N. The per-location field keeps its spatial
        # structure, rescaled to the variance-fit magnitude.
        m_vcal = scale_members(m_i, var_factor)
        m_vfld = scale_members(
            m_i, s_field * (var_factor / max(float(scale), 1e-12))
        )
        # Deployed spectral-calibration chain: radial filter then the
        # chain's own refit variance scale (calibrate.py).
        m_sfc = scale_members(
            apply_spectral_filter(m_i, *fits["spec_filter"], spec_domain),
            fits["var_factor_sf"],
        )
        cov_raw += ensemble_coverage(m_i, hf_i, levels=COVERAGE_LEVELS)
        cov_cal += ensemble_coverage(m_cal, hf_i, levels=COVERAGE_LEVELS)
        cov_fld += ensemble_coverage(m_fld, hf_i, levels=COVERAGE_LEVELS)
        crps_raw += float(np.mean(np.asarray(ensemble_crps(m_i, hf_i))))
        crps_cal += float(np.mean(np.asarray(ensemble_crps(m_cal, hf_i))))
        crps_fld += float(np.mean(np.asarray(ensemble_crps(m_fld, hf_i))))
        mu_i, var_i = m_i.mean(axis=0), m_i.var(axis=0)
        cov_q += scaled_interval_coverage(
            mu_i, var_i, hf_i, iscales, levels=COVERAGE_LEVELS
        )
        # Fair single-factor baseline on the SAME two-moment
        # interval construction (what the deployed var*s^2 path
        # produces) — the ensemble-quantile curves above use
        # empirical member quantiles, a different interval
        # construction, so comparing per-level against them would
        # conflate recalibration with construction.
        cov_s1 += scaled_interval_coverage(
            mu_i, var_i, hf_i,
            jnp.full(len(COVERAGE_LEVELS), scale),
            levels=COVERAGE_LEVELS,
        )
        lf_up_i = lf_upsample(
            jnp.asarray(ds.denorm_lf(ds.lf[i, :t_cal])),
            cfg.model.hf_shape,
        )
        # Variance-statistic references on the eval.ref_steps
        # horizon (falls back to the t_cal window reference).
        hf_ref_i = (
            jnp.asarray(hf_ref_long[i])
            if hf_ref_long is not None
            else hf_i
        )
        ref_tke_i = tke_field(hf_ref_i.var(axis=0))
        rey_ref_i = reynolds_stress_uv(hf_ref_i, axes=(0,))
        for tag, m in (("raw", m_i), ("cal", m_vcal), ("fld", m_vfld),
                       ("sfc", m_sfc)):
            # Pooled (ensemble x time) variance == the deployed
            # total_variance(mean, var) construction exactly.
            sm[f"tke_{tag}"] += float(
                relative_l2(tke_field(m.var(axis=(0, 1))), ref_tke_i)
            )
            sm[f"rey_{tag}"] += float(
                relative_l2(
                    reynolds_stress_uv(m, axes=(0, 1)), rey_ref_i
                )
            )
        sm["tke_base"] += float(
            relative_l2(tke_field(lf_up_i.var(axis=0)), ref_tke_i)
        )
        sm["rey_base"] += float(
            relative_l2(
                reynolds_stress_uv(lf_up_i, axes=(0,)), rey_ref_i
            )
        )
        base_fl_i = lf_up_i[..., :2] - lf_up_i[..., :2].mean(
            0, keepdims=True
        )
        ref_fl_i = hf_ref_i[..., :2] - hf_ref_i[..., :2].mean(
            0, keepdims=True
        )
        raw_fl = m_i[..., :2] - m_i[..., :2].mean(
            axis=(0, 1), keepdims=True
        )
        # Holdout SPECTRUM scoring (the deployment-honest spectrum
        # metric: fit-split filter, scored on the holdout split) for
        # raw, deployed-chain, and baseline members.
        sfc_fl = m_sfc[..., :2] - m_sfc[..., :2].mean(
            axis=(0, 1), keepdims=True
        )
        _, e_ref_h = energy_spectrum(ref_fl_i, spec_domain, taper=True)
        for tag, fl_h in (("raw", raw_fl), ("sfc", sfc_fl),
                          ("base", base_fl_i)):
            _, e_h = energy_spectrum(fl_h, spec_domain, taper=True)
            sm[f"spec_{tag}"] += float(relative_l2(
                jnp.log(e_h[1:] + 1e-20), jnp.log(e_ref_h[1:] + 1e-20)
            ))
        for c, cname in enumerate(("u", "v")):
            ref_std_i = float(jnp.std(ref_fl_i[..., c])) + 1e-12
            for tag, m in (("raw", m_i), ("cal", m_vcal), ("fld", m_vfld),
                           ("sfc", m_sfc)):
                fl = m[..., :2] - m[..., :2].mean(
                    axis=(0, 1), keepdims=True
                )
                sm[f"w1{cname}_{tag}"] += (
                    float(wasserstein1(fl[..., c], ref_fl_i[..., c]))
                    / ref_std_i
                )
            # Distribution-shape calibration: the quantile map fit
            # on the disjoint split applied to the RAW member
            # fluctuations (calibrate.fit_quantile_map), pooled
            # and streamwise-stratified variants.
            fl_q = apply_quantile_map(raw_fl[..., c], *qmaps[c])
            sm[f"w1{cname}_qmap"] += (
                float(wasserstein1(fl_q, ref_fl_i[..., c])) / ref_std_i
            )
            fl_qx = apply_quantile_map_stratified(
                jnp.moveaxis(raw_fl[..., c], -1, 0), *qmaps_x[c]
            )
            sm[f"w1{cname}_qmapx"] += (
                float(wasserstein1(fl_qx, ref_fl_i[..., c])) / ref_std_i
            )
            # LF-conditioned self-calibration: uses ONLY the holdout
            # trajectory's own deploy-available statistics (its member
            # fluctuation std and its LF fluctuation std).
            fl_lf = apply_lf_conditioned_qmap(
                raw_fl[..., c],
                float(jnp.std(raw_fl[..., c])),
                float(jnp.std(base_fl_i[..., c])),
                *fits["qmaps_lf"][c],
            )
            sm[f"w1{cname}_qmaplf"] += (
                float(wasserstein1(fl_lf, ref_fl_i[..., c])) / ref_std_i
            )
            sm[f"w1{cname}_base"] += (
                float(wasserstein1(base_fl_i[..., c], ref_fl_i[..., c]))
                / ref_std_i
            )
        del m_i, m_cal, m_fld, m_vcal, m_vfld, m_sfc, raw_fl, sfc_fl
    n_rep = len(report_idx)
    sm = {k: v / n_rep for k, v in sm.items()}
    return {
        "sm": sm,
        "cov_raw": cov_raw / n_rep,
        "cov_cal": cov_cal / n_rep,
        "cov_fld": cov_fld / n_rep,
        "cov_q": cov_q / n_rep,
        "cov_s1": cov_s1 / n_rep,
        "crps_raw": crps_raw / n_rep,
        "crps_cal": crps_cal / n_rep,
        "crps_fld": crps_fld / n_rep,
    }


def calibration_metric_rows(fits: dict, scores: dict, hold_idx) -> dict:
    """Flat eval_metrics.json rows for the calibration families."""
    sm = scores["sm"]
    scale, s_field = fits["scale"], fits["s_field"]
    return dict(
        spread_scale=float(scale),
        # Programmatic semantics marker (r3 advisor finding): the
        # *_holdout_calibrated second-moment keys score members
        # inflated by the unbiased VARIANCE-scale fit (m_vcal) since
        # r3; rounds 1-2 artifacts used the interval-fit scale under
        # the same key names and are not like-for-like.
        calibration_semantics="varcal-since-r3 (variance-scale fit; "
                              "see eval/calibrate.py)",
        # Unbiased variance-statistic inflation (what the cal/fld
        # second-moment rows deploy; differs from spread_scale by
        # the finite-ensemble z-fit bias — equal as N -> inf).
        variance_scale_fit=fits["var_factor"],
        calibration_in_sample=(not hold_idx),
        # Holdout second-moment skill, raw vs calibrated dispersion
        # (skill > 1 = beats the bicubic baseline on that metric).
        tke_rel_l2_holdout_raw=sm["tke_raw"],
        tke_rel_l2_holdout_calibrated=sm["tke_cal"],
        baseline_tke_rel_l2_holdout=sm["tke_base"],
        tke_skill_holdout_raw=skill(sm["tke_raw"], sm["tke_base"]),
        tke_skill_holdout_calibrated=skill(
            sm["tke_cal"], sm["tke_base"]
        ),
        reynolds_uv_rel_l2_holdout_raw=sm["rey_raw"],
        reynolds_uv_rel_l2_holdout_calibrated=sm["rey_cal"],
        baseline_reynolds_uv_rel_l2_holdout=sm["rey_base"],
        reynolds_skill_holdout_calibrated=skill(
            sm["rey_cal"], sm["rey_base"]
        ),
        pdf_w1_u_holdout_raw=sm["w1u_raw"],
        pdf_w1_u_holdout_calibrated=sm["w1u_cal"],
        baseline_pdf_w1_u_holdout=sm["w1u_base"],
        pdf_w1_u_skill_holdout_calibrated=skill(
            sm["w1u_cal"], sm["w1u_base"]
        ),
        pdf_w1_v_holdout_raw=sm["w1v_raw"],
        pdf_w1_v_holdout_calibrated=sm["w1v_cal"],
        baseline_pdf_w1_v_holdout=sm["w1v_base"],
        pdf_w1_v_skill_holdout_calibrated=skill(
            sm["w1v_cal"], sm["w1v_base"]
        ),
        # Distribution-shape (quantile-map) calibration, fit on
        # the disjoint split (calibrate.fit_quantile_map; deploys
        # via the saved quantile_map.npz).
        pdf_w1_u_holdout_qmap=sm["w1u_qmap"],
        pdf_w1_u_skill_holdout_qmap=skill(
            sm["w1u_qmap"], sm["w1u_base"]
        ),
        pdf_w1_v_holdout_qmap=sm["w1v_qmap"],
        pdf_w1_v_skill_holdout_qmap=skill(
            sm["w1v_qmap"], sm["w1v_base"]
        ),
        # LF-conditioned self-calibrating maps (per-trajectory
        # standardization + LF-regressed scale; deployable via the
        # quantile_map.npz l*/lalpha* arrays).
        pdf_w1_u_holdout_qmaplf=sm["w1u_qmaplf"],
        pdf_w1_u_skill_holdout_qmaplf=skill(
            sm["w1u_qmaplf"], sm["w1u_base"]
        ),
        pdf_w1_v_holdout_qmaplf=sm["w1v_qmaplf"],
        pdf_w1_v_skill_holdout_qmaplf=skill(
            sm["w1v_qmaplf"], sm["w1v_base"]
        ),
        # Streamwise-stratified quantile maps (one per x-column).
        pdf_w1_u_holdout_qmapx=sm["w1u_qmapx"],
        pdf_w1_u_skill_holdout_qmapx=skill(
            sm["w1u_qmapx"], sm["w1u_base"]
        ),
        pdf_w1_v_holdout_qmapx=sm["w1v_qmapx"],
        pdf_w1_v_skill_holdout_qmapx=skill(
            sm["w1v_qmapx"], sm["w1v_base"]
        ),
        # Spectral-calibration chain (radial filter + refit variance
        # scale — calibrate.fit_spectral_filter; deploys via the saved
        # spectral_filter.npz): holdout-scored spectrum + the same
        # second-moment families.
        spectrum_rel_l2_holdout_raw=sm["spec_raw"],
        spectrum_rel_l2_holdout_speccal=sm["spec_sfc"],
        baseline_spectrum_rel_l2_holdout=sm["spec_base"],
        spectrum_skill_holdout_raw=skill(sm["spec_raw"], sm["spec_base"]),
        spectrum_skill_holdout_speccal=skill(
            sm["spec_sfc"], sm["spec_base"]
        ),
        variance_scale_fit_speccal=fits["var_factor_sf"],
        tke_rel_l2_holdout_speccal=sm["tke_sfc"],
        tke_skill_holdout_speccal=skill(sm["tke_sfc"], sm["tke_base"]),
        reynolds_uv_rel_l2_holdout_speccal=sm["rey_sfc"],
        reynolds_skill_holdout_speccal=skill(
            sm["rey_sfc"], sm["rey_base"]
        ),
        pdf_w1_u_holdout_speccal=sm["w1u_sfc"],
        pdf_w1_u_skill_holdout_speccal=skill(
            sm["w1u_sfc"], sm["w1u_base"]
        ),
        pdf_w1_v_holdout_speccal=sm["w1v_sfc"],
        pdf_w1_v_skill_holdout_speccal=skill(
            sm["w1v_sfc"], sm["w1v_base"]
        ),
        spectral_filter_stats={
            "min": float(np.asarray(fits["spec_filter"][1]).min()),
            "max": float(np.asarray(fits["spec_filter"][1]).max()),
            "mean": float(np.asarray(fits["spec_filter"][1]).mean()),
        },
        # Per-location spread-field calibration (the "fld" column):
        # same disjoint fit/holdout protocol, field deploys via
        # eval.spread_field (saved as spread_field.npy below).
        tke_rel_l2_holdout_fieldcal=sm["tke_fld"],
        tke_skill_holdout_fieldcal=skill(sm["tke_fld"], sm["tke_base"]),
        reynolds_uv_rel_l2_holdout_fieldcal=sm["rey_fld"],
        reynolds_skill_holdout_fieldcal=skill(
            sm["rey_fld"], sm["rey_base"]
        ),
        pdf_w1_u_holdout_fieldcal=sm["w1u_fld"],
        pdf_w1_u_skill_holdout_fieldcal=skill(
            sm["w1u_fld"], sm["w1u_base"]
        ),
        pdf_w1_v_holdout_fieldcal=sm["w1v_fld"],
        pdf_w1_v_skill_holdout_fieldcal=skill(
            sm["w1v_fld"], sm["w1v_base"]
        ),
        spread_field_stats={
            "min": float(s_field.min()),
            "max": float(s_field.max()),
            "mean": float(s_field.mean()),
        },
        coverage_holdout_raw={
            f"{q:.2f}": float(c)
            for q, c in zip(COVERAGE_LEVELS, np.asarray(scores["cov_raw"]))
        },
        coverage_holdout_recalibrated={
            f"{q:.2f}": float(c)
            for q, c in zip(COVERAGE_LEVELS, np.asarray(scores["cov_cal"]))
        },
        coverage_holdout_fieldcal={
            f"{q:.2f}": float(c)
            for q, c in zip(COVERAGE_LEVELS, np.asarray(scores["cov_fld"]))
        },
        crps_holdout_raw=scores["crps_raw"],
        crps_holdout_recalibrated=scores["crps_cal"],
        crps_holdout_fieldcal=scores["crps_fld"],
        interval_scales={
            f"{q:.2f}": float(s)
            for q, s in zip(COVERAGE_LEVELS, np.asarray(fits["iscales"]))
        },
        coverage_holdout_per_level={
            f"{q:.2f}": float(c)
            for q, c in zip(COVERAGE_LEVELS, np.asarray(scores["cov_q"]))
        },
        coverage_holdout_single_factor={
            f"{q:.2f}": float(c)
            for q, c in zip(COVERAGE_LEVELS, np.asarray(scores["cov_s1"]))
        },
    )
