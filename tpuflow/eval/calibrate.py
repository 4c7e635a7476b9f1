"""Post-hoc UQ recalibration: ensemble spread scaling.

Parity+ over the reference (SURVEY.md §2 physics-statistics row): the
reference reports raw ensemble variance maps (arXiv:2006.04731 §4);
TM-Glow ensembles at the paper's tau=0.7 are sharp but underdispersed
(measured coverage ~0.24 at nominal 0.50 — docs/PARITY.md). Standard
fix from the probabilistic-forecasting literature: fit a single spread
inflation factor on held-out data and scale member deviations around
the ensemble mean. The scale is fit by moment matching

    s = RMS((ref - mean) / std)

which is exact for a Gaussian predictive: after scaling, the z-scores
(ref - mean) / (s * std) have unit RMS, so central-interval coverage
matches nominal levels in expectation. Fitting uses one trajectory;
reporting uses a disjoint one (see cli/evaluate.py).

The scale transfers to the O(1)-memory two-moment rollout stats as
``var * s**2`` (``eval.spread_scale`` config field, applied by
cli/rollout.py), so calibrated UQ costs nothing at deployment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ensemble_zscores(
    members: jnp.ndarray, ref: jnp.ndarray, axis: int = 0
) -> jnp.ndarray:
    """Per-point z-scores (ref - mean) / std of an ensemble.

    The shared front half of both fit functions, exposed so multi-
    trajectory fits can pool z-scores trajectory-by-trajectory (the
    z array is N-fold smaller than the member fields, so the pooled
    fit needs only O(one trajectory) member memory — see
    cli/evaluate.py).

    ddof=0 to match the deployment target exactly: rollout stats mode
    accumulates jnp.var (population variance), and eval.spread_scale
    multiplies THAT by s^2 — fitting against a ddof=1 std would leave
    deployed two-moment intervals sqrt((N-1)/N) too narrow. The
    variance floor matches the evaluation side (stats.gaussian_coverage
    / scaled_interval_coverage): degenerate zero-spread points (masked
    solid regions) must z-score identically at fit and deploy time.
    """
    x = jnp.moveaxis(members, axis, 0)
    if x.shape[0] < 2:
        raise ValueError(
            f"ensemble_zscores needs >= 2 members (got {x.shape[0]})"
        )
    return (ref - x.mean(axis=0)) / jnp.sqrt(x.var(axis=0) + 1e-20)


def fit_spread_scale_from_z(z: jnp.ndarray) -> jnp.ndarray:
    """Spread inflation factor from (possibly pooled) z-scores:
    s = RMS(z)."""
    return jnp.sqrt(jnp.mean(z * z))


def fit_variance_scale_from_moments(
    sq_resid_mean, ens_var_mean, n_members: int
):
    """Member-deviation inflation for VARIANCE-derived statistics
    (TKE, Reynolds stress, fluctuation PDFs), fit by unbiased moment
    matching.

    The z-RMS interval fit is the WRONG inflation for variance
    statistics at small N: under perfect calibration E[z^2] =
    (N+1)/(N-3) (the 1/chi^2_{N-1} tail; measured RMS(z) = 2.19 at
    N=4 for an exactly calibrated ensemble), so scaling member
    deviations by the interval factor over-disperses pooled variances
    ~5x at the cylinder preset's N=4 (measured: calibrated TKE error
    1.79 vs 0.82 raw). This fit avoids E[1/v] entirely — it matches
    ratios of EXPECTATIONS, which are finite-N unbiased:

        sigma_true^2 = E[(ref - mean)^2] - E[v] / (N-1)
        s_m^2        = sigma_true^2 * (N-1) / (N * E[v])

    where v is the POPULATION ensemble variance (the rollout stats
    contract); E[v] = m2 (N-1)/N for true member variance m2, so s_m
    = sigma_true / sqrt(m2): scaled members are draw-level
    exchangeable with the reference. For a perfectly calibrated
    ensemble s_m = 1 at every N; for N -> inf it agrees with the
    interval fit.

    Args:
      sq_resid_mean: pooled mean of (ref - ensemble mean)^2.
      ens_var_mean: pooled mean of the population ensemble variance.
      n_members: ensemble size N (>= 2).

    Returns: scalar member-deviation factor (floored at 0 when the
    residuals are smaller than the ensemble-mean noise term —
    an overdispersed ensemble at tiny N).
    """
    if n_members < 2:
        raise ValueError(
            f"fit_variance_scale needs >= 2 members, got {n_members}"
        )
    r2 = jnp.asarray(sq_resid_mean, jnp.float32)
    v = jnp.asarray(ens_var_mean, jnp.float32) + 1e-20
    sigma2 = jnp.maximum(r2 - v / (n_members - 1), 0.0)
    return jnp.sqrt(sigma2 * (n_members - 1) / (n_members * v))


def fit_variance_scale(
    members: jnp.ndarray, ref: jnp.ndarray, axis: int = 0
) -> jnp.ndarray:
    """``fit_variance_scale_from_moments`` on raw member fields."""
    x = jnp.moveaxis(members, axis, 0)
    n = x.shape[0]
    r2 = jnp.mean((ref - x.mean(axis=0)) ** 2)
    v = jnp.mean(x.var(axis=0))
    return fit_variance_scale_from_moments(r2, v, n)


def fit_quantile_map(
    pred_vals: jnp.ndarray,
    ref_vals: jnp.ndarray,
    n_quantiles: int = 65,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CDF-matching (quantile-map) calibration of a pooled marginal.

    Linear scaling fixes a distribution's second moment but not its
    SHAPE: the tau-reduced flow ensemble's fluctuation marginal stays
    measurably wider-shouldered than the converged HF reference after
    spread calibration (r3: PDF-W1 0.083 vs bicubic 0.066 with the
    gap flat in tau — dispersion magnitude is not what is left).
    Quantile mapping is the standard distribution-shape correction in
    ensemble postprocessing / climate downscaling: map the predicted
    marginal's quantiles onto the reference's at matched probability
    levels, giving a monotone piecewise-linear transform that makes
    the fit-split marginal match the reference exactly at the knots
    and transfers to held-out data to the extent the shape error is
    systematic (scored honestly on the disjoint holdout split by
    cli/evaluate.py).

    Args:
      pred_vals: pooled predicted samples (any shape; raveled).
      ref_vals: pooled reference samples (any shape; raveled).
      n_quantiles: number of knots (probability levels are midpoints,
        avoiding the extreme order statistics' noise).

    Returns: (xq, yq) knot arrays — apply with ``apply_quantile_map``.
    """
    p = (jnp.arange(n_quantiles, dtype=jnp.float32) + 0.5) / n_quantiles
    xq = jnp.quantile(pred_vals.ravel().astype(jnp.float32), p)
    yq = jnp.quantile(ref_vals.ravel().astype(jnp.float32), p)
    # Strictly increasing knots keep the map invertible even where
    # the empirical quantiles tie (masked/constant regions).
    eps = 1e-7 * (xq[-1] - xq[0] + 1.0)
    xq = jnp.maximum.accumulate(xq + eps * jnp.arange(n_quantiles))
    return xq, yq


def apply_quantile_map(
    vals: jnp.ndarray, xq: jnp.ndarray, yq: jnp.ndarray
) -> jnp.ndarray:
    """Apply a fitted quantile map with linear tail extrapolation.

    jnp.interp clamps outside the knot range; clamping would collapse
    every out-of-range tail value onto the end knot and destroy the
    tail shape, so the end segments' slopes extend linearly instead.
    """
    v = vals.astype(jnp.float32)
    out = jnp.interp(v, xq, yq)
    lo_slope = (yq[1] - yq[0]) / (xq[1] - xq[0])
    hi_slope = (yq[-1] - yq[-2]) / (xq[-1] - xq[-2])
    out = jnp.where(v < xq[0], yq[0] + (v - xq[0]) * lo_slope, out)
    out = jnp.where(v > xq[-1], yq[-1] + (v - xq[-1]) * hi_slope, out)
    return out


def fit_spectral_filter(
    e_model: jnp.ndarray,
    e_ref: jnp.ndarray,
    k_bins: jnp.ndarray,
    cap: float = 1.2,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Radial spectral calibration filter S(k) = sqrt(E_ref / E_model).

    Post-hoc SHAPE calibration of the sampled fields themselves — the
    spectral analogue of the spread-scale: the r4 in-loop campaign
    measured that the flow cannot reshape its sampling-noise spectrum
    without either collapsing dispersion or overflowing the decoder's
    latent validity range (docs/PARITY.md r4 closure), so the
    correction moves to the calibration layer. Fit on the fit split's
    pooled member-fluctuation spectra vs the converged references;
    apply with ``apply_spectral_filter`` (deploys like spread_scale —
    a (k, S) radial profile rides the artifact chain).

    ``cap`` bounds amplification (S <= cap): the filter's job is to
    REMOVE hallucinated high-k noise; amplifying bins where the model
    under-shoots would amplify whatever junk lives there.

    Args:
      e_model: (nbins,) pooled member-fluctuation spectrum (fit split).
      e_ref: (nbins,) pooled converged-reference spectrum.
      k_bins: (nbins,) physical bin-center wavenumbers.

    Returns (k_bins, s_vals), each (nbins,).
    """
    s = jnp.sqrt((e_ref + 1e-30) / (e_model + 1e-30))
    s = jnp.clip(s, 0.0, cap)
    # The k=0 bin is the mean mode — never touched by the filter.
    s = s.at[0].set(1.0)
    return jnp.asarray(k_bins, jnp.float32), s.astype(jnp.float32)


def apply_spectral_filter(
    members: jnp.ndarray,
    k_bins: jnp.ndarray,
    s_vals: jnp.ndarray,
    domain: tuple[float, float],
) -> jnp.ndarray:
    """Apply a radial spectral filter to member FLUCTUATIONS.

    The (time x ensemble) mean field passes through untouched (the
    filter corrects fluctuation shape, not the mean prediction); each
    member's fluctuation is filtered in Fourier space with S(|k|)
    interpolated from the fitted radial profile (linear, clamped to
    the end values outside the fitted range).

    Args:
      members: (N, T, H, W, C) physical-unit member fields.
      k_bins, s_vals: fitted radial profile (fit_spectral_filter).
      domain: (Ly, Lx) physical extents — must match the fit's
        binning so |k| means the same thing.

    Returns filtered members, same shape.
    """
    ly, lx = float(domain[0]), float(domain[1])
    h, w = members.shape[-3], members.shape[-2]
    mean = members.mean(axis=(0, 1), keepdims=True)
    fluct = members - mean
    ky = jnp.asarray(np.fft.fftfreq(h) * h / ly)
    kx = jnp.asarray(np.fft.rfftfreq(w) * w / lx)
    kr = jnp.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)
    s2d = jnp.interp(kr, k_bins, s_vals)  # clamps at the ends
    x = jnp.moveaxis(fluct, -1, 0)  # (C, N, T, H, W)
    spec = jnp.fft.rfft2(x, axes=(-2, -1))
    x_f = jnp.fft.irfft2(spec * s2d, s=(h, w), axes=(-2, -1))
    return mean + jnp.moveaxis(x_f, 0, -1)


def fit_lf_conditioned_qmap(
    pred_parts: list,
    ref_parts: list,
    lf_stds: list,
    n_quantiles: int = 65,
) -> tuple[jnp.ndarray, jnp.ndarray, float]:
    """LF-conditioned (per-trajectory self-calibrating) quantile map.

    The v' fluctuation marginal is NON-STATIONARY across trajectories
    (each trajectory has its own flow parameters), so a global shape
    map fit on disjoint trajectories does not transfer — the r3
    measured failure (pdf_w1_v skill 0.47 best-of-five; VERDICT r3
    item 6). This factorizes the calibration into pieces that DO
    transfer, all deploy-available:

      shape: ONE pooled quantile map between per-trajectory
        SELF-STANDARDIZED marginals (each trajectory's fluctuations
        divided by its own std) — removing the per-trajectory scale
        that breaks the global map;
      scale: the target std regressed on the trajectory's OWN
        (bicubic-upsampled) LF fluctuation std,
        sigma_ref_j ~ alpha * sigma_LF_j, alpha fit on the fit split.

    Deploy on trajectory j (apply_lf_conditioned_qmap): standardize by
    the ensemble's own std, map the shape, rescale by
    alpha * sigma_LF_j. Nothing uses reference data at deploy time.

    Args:
      pred_parts: per-fit-trajectory member-fluctuation sample arrays.
      ref_parts: per-fit-trajectory reference-fluctuation samples.
      lf_stds: per-fit-trajectory LF-upsampled fluctuation stds.

    Returns (xq, yq, alpha).
    """
    pred_std = jnp.concatenate([
        jnp.asarray(p).ravel() / (float(jnp.std(jnp.asarray(p))) + 1e-12)
        for p in pred_parts
    ])
    ref_std = jnp.concatenate([
        jnp.asarray(r).ravel() / (float(jnp.std(jnp.asarray(r))) + 1e-12)
        for r in ref_parts
    ])
    xq, yq = fit_quantile_map(pred_std, ref_std, n_quantiles)
    ratios = [
        float(jnp.std(jnp.asarray(r))) / (s + 1e-12)
        for r, s in zip(ref_parts, lf_stds)
    ]
    alpha = float(np.mean(ratios))
    return xq, yq, alpha


def apply_lf_conditioned_qmap(
    vals: jnp.ndarray,
    sigma_member: float,
    sigma_lf: float,
    xq: jnp.ndarray,
    yq: jnp.ndarray,
    alpha: float,
) -> jnp.ndarray:
    """Apply the LF-conditioned map on a new trajectory using only
    deploy-available statistics (the ensemble's own fluctuation std
    and the trajectory's LF fluctuation std)."""
    z = vals / (sigma_member + 1e-12)
    return alpha * sigma_lf * apply_quantile_map(z, xq, yq)


def fit_quantile_map_stratified(
    pred_vals: jnp.ndarray,
    ref_vals: jnp.ndarray,
    n_quantiles: int = 65,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-stratum quantile maps: one CDF match per leading index.

    A single pooled map fails when the marginal is a spatial MIXTURE
    whose mixture weights the ensemble already gets right but whose
    component shapes it distorts differently (measured: the
    backward-step v' marginal — wake vs freestream strata — transfers
    a pooled map at skill 0.31 where linear scaling reaches 0.47).
    Stratifying by streamwise column is the climate-downscaling
    standard (bias correction is fit per grid cell); each stratum's
    map corrects its own component and the pooled mixture follows.

    Args:
      pred_vals: (S, M) predicted samples per stratum.
      ref_vals: (S, K) reference samples per stratum.

    Returns: (xq, yq), each (S, n_quantiles) — apply with
    ``apply_quantile_map_stratified``.
    """
    p = (jnp.arange(n_quantiles, dtype=jnp.float32) + 0.5) / n_quantiles
    xq = jnp.quantile(
        pred_vals.astype(jnp.float32), p, axis=1
    ).T  # (S, n_q)
    yq = jnp.quantile(ref_vals.astype(jnp.float32), p, axis=1).T
    span = xq[:, -1:] - xq[:, :1] + 1.0
    eps = 1e-7 * span * jnp.arange(n_quantiles)
    xq = jax.lax.cummax(xq + eps, axis=1)
    return xq, yq


def apply_quantile_map_stratified(
    vals: jnp.ndarray, xq: jnp.ndarray, yq: jnp.ndarray
) -> jnp.ndarray:
    """Apply per-stratum maps: vals (S, ...) with stratum axis 0."""
    flat = vals.reshape(vals.shape[0], -1)
    out = jax.vmap(apply_quantile_map)(flat, xq, yq)
    return out.reshape(vals.shape)


def fit_spread_field_from_z(
    z_stack: jnp.ndarray,
    prior_weight: float = 8.0,
    clip: tuple[float, float] = (0.25, 6.0),
) -> jnp.ndarray:
    """Per-location spread inflation FIELD from pooled z-score fields.

    A single scalar factor fixes the ensemble's overall dispersion but
    not its spatial structure: measured TM-Glow variance maps misplace
    spread between the shear layers and the freestream, which a global
    factor cannot correct (the r2 converged eval: calibrated TKE error
    0.275 vs bicubic 0.158 — structure, not magnitude, is what's left).
    Per-location moment matching is the standard refinement in the
    ensemble-postprocessing literature (NGR/EMOS fit per grid point);
    it stays deployment-honest exactly like the scalar: fit on the
    disjoint fit split, scored on holdout, deployed as
    ``var * s(h, w, c)^2``.

    Args:
      z_stack: (M, *field) pooled z-score fields — M = fit-split
        timesteps x trajectories stacked on axis 0 (each element an
        ``ensemble_zscores`` output slice).
      prior_weight: pseudo-sample count shrinking each location toward
        the GLOBAL scale (the scalar fit) — low-signal locations must
        not chase noise.
      clip: hard bounds on the factor. Degenerate locations (masked
        solid regions: ensemble std ~ 0 against a constant reference)
        produce unbounded z; bounded inflation keeps the deployed
        field physical.

    Returns: (*field,) array of per-location factors.
    """
    z2 = z_stack.astype(jnp.float32) ** 2
    n = z2.shape[0]
    g2 = jnp.mean(z2)  # global scalar fit (squared), the shrink target
    s2 = (z2.sum(axis=0) + prior_weight * g2) / (n + prior_weight)
    return jnp.clip(jnp.sqrt(s2), *clip)


def fit_spread_scale(
    members: jnp.ndarray, ref: jnp.ndarray, axis: int = 0
) -> jnp.ndarray:
    """Spread inflation factor fit by z-score moment matching.

    Args:
      members: ensemble samples, member axis ``axis`` (size N >= 2).
      ref: reference field, shape = members without the member axis.

    Returns: scalar s such that ``mean + s * (members - mean)`` is
    calibrated in the unit-z-RMS sense. s > 1 means the raw ensemble
    is underdispersed; s < 1 overdispersed.
    """
    return fit_spread_scale_from_z(ensemble_zscores(members, ref, axis))


def scale_members(
    members: jnp.ndarray, scale: jnp.ndarray | float, axis: int = 0
) -> jnp.ndarray:
    """Inflate member deviations around the ensemble mean by ``scale``.

    Mean-preserving: the recalibrated ensemble has identical ensemble
    mean and ``scale``-times the spread, so field-error metrics are
    unchanged while coverage/CRPS respond to the new dispersion.
    """
    mean = jnp.mean(members, axis=axis, keepdims=True)
    return mean + scale * (members - mean)


def fit_interval_scales(
    members: jnp.ndarray,
    ref: jnp.ndarray,
    levels: tuple[float, ...] = (0.5, 0.8, 0.9, 0.95),
    axis: int = 0,
) -> jnp.ndarray:
    """Per-level interval recalibration (quantile-map form).

    A single spread factor calibrates ALL central intervals only when
    the z-scores are Gaussian; measured TM-Glow residuals are
    heavy-tailed (docs/PARITY.md), so one factor that fixes the 50%
    interval still under-covers at 95%. Following the recalibration
    recipe of Kuleshov et al. 2018 adapted to central intervals: for
    each nominal level q, the factor

        s_q = quantile(|z|, q) / ndtri((1 + q) / 2)

    makes the two-moment interval  mean +- s_q * ndtri((1+q)/2) * std
    cover exactly q on the fit data, whatever the z distribution.
    Deploy by widening each reported interval with its own s_q (the
    two-moment rollout stats are all that's needed).

    Returns: (len(levels),) array of per-level factors s_q.
    """
    return fit_interval_scales_from_z(
        ensemble_zscores(members, ref, axis), levels
    )


def fit_interval_scales_from_z(
    z: jnp.ndarray, levels: tuple[float, ...] = (0.5, 0.8, 0.9, 0.95)
) -> jnp.ndarray:
    """Per-level factors from (possibly pooled) z-scores — the quantile
    half of ``fit_interval_scales``."""
    from tpuflow.eval.stats import interval_z

    qs = jnp.asarray(levels)
    return jnp.quantile(jnp.abs(z).ravel(), qs) / interval_z(qs)


def scaled_interval_coverage(
    mean: jnp.ndarray,
    var: jnp.ndarray,
    ref: jnp.ndarray,
    scales: jnp.ndarray,
    levels: tuple[float, ...] = (0.5, 0.8, 0.9, 0.95),
) -> jnp.ndarray:
    """Empirical coverage of per-level recalibrated two-moment
    intervals mean +- s_q * interval_z(q) * std — the deployment-side
    companion of ``fit_interval_scales`` (needs only rollout stats).
    Thin wrapper over ``stats.gaussian_coverage(scales=...)`` so both
    interval constructions share one implementation."""
    from tpuflow.eval.stats import gaussian_coverage

    return gaussian_coverage(mean, var, ref, levels, scales=scales)
