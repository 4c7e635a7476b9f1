"""Physics statistics: TKE, velocity moments, field error norms,
energy spectra, and UQ calibration scores (CRPS, interval coverage).

Parity: SURVEY.md §2 "Physics statistics" / arXiv:2006.04731 §4
experiment metrics — turbulent kinetic energy k = 1/2 sum_i var(u_i'),
velocity-field moments over ensemble/time, and relative error norms of
predicted mean/variance against the high-fidelity reference.

All functions take either ensemble fields (N, ..., C) or precomputed
two-moment stats, in PHYSICAL units — denormalize first: FIELDS with
``TrajectoryDataset.denorm_hf`` (affine), VARIANCES with
``TrajectoryDataset.denorm_hf_var`` (sigma^2 scaling only; the affine
field formula would shift a variance by the mean flow). Channel
convention: [..., 0]=u, 1=v, 2=p.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tke_field(var_uv: jnp.ndarray) -> jnp.ndarray:
    """Turbulent kinetic energy from velocity variance.

    Args:
      var_uv: (..., C>=2) per-point variance of (u, v[, p]) over the
        fluctuation axis (ensemble and/or time).

    Returns:
      (...,) k = 1/2 (var_u + var_v).
    """
    return 0.5 * (var_uv[..., 0] + var_uv[..., 1])


def ensemble_stats(fields: jnp.ndarray, axis: int = 0) -> dict[str, jnp.ndarray]:
    """Mean/variance over the ensemble axis of sample fields."""
    return {
        "mean": jnp.mean(fields, axis=axis),
        "var": jnp.var(fields, axis=axis),
    }


def velocity_moments(
    fields: jnp.ndarray, axes: tuple[int, ...] = (0,)
) -> dict[str, jnp.ndarray]:
    """First four central moments of each channel over ``axes``
    (ensemble and/or time) — the reference's velocity-moment curves."""
    mean = jnp.mean(fields, axis=axes, keepdims=True)
    d = fields - mean
    var = jnp.mean(d**2, axis=axes)
    # Denominators from var + eps, not (std + tiny)**k: for degenerate
    # points (e.g. masked solid regions where d == 0) std**4 with
    # std ~ 1e-12 underflows float32 to zero and yields NaN; var-based
    # powers stay representable and give the correct 0 moments.
    eps = 1e-12
    skew = jnp.mean(d**3, axis=axes) / (var + eps) ** 1.5
    kurt = jnp.mean(d**4, axis=axes) / (var + eps) ** 2
    return {
        "mean": jnp.squeeze(mean, axis=axes),
        "var": var,
        "skew": skew,
        "kurt": kurt,
    }


def reynolds_stress_uv(
    fields: jnp.ndarray, axes: tuple[int, ...] = (0,)
) -> jnp.ndarray:
    """Reynolds shear stress <u'v'> over ``axes`` (ensemble and/or time).

    The off-diagonal Reynolds-stress tensor component — the shear
    counterpart of TKE (which is half the tensor's trace, tke_field) in
    the reference's physics comparisons (arXiv:2006.04731 §4 family of
    second-moment statistics).

    Args:
      fields: (..., C>=2) velocity fields, channels (u, v[, ...]).

    Returns:
      (...,) covariance of the u and v fluctuations over ``axes``.
    """
    u, v = fields[..., 0], fields[..., 1]
    du = u - jnp.mean(u, axis=axes, keepdims=True)
    dv = v - jnp.mean(v, axis=axes, keepdims=True)
    return jnp.mean(du * dv, axis=axes)


def vorticity(
    fields: jnp.ndarray, dx: float = 1.0, dy: float = 1.0
) -> jnp.ndarray:
    """Out-of-plane vorticity w = dv/dx - du/dy of 2D velocity fields.

    The reference's cylinder-array comparison figures are instantaneous
    vorticity contours (arXiv:2006.04731 §4); this is the field they
    plot. Central differences on the uniform training grid. Pass the
    physical grid spacings: on anisotropic grids (both shipped cases —
    the domain is 4x1 in x,y) unit spacing would weight the dv/dx
    shear term by dx/dy relative to du/dy, which is NOT a constant
    rescaling and does not cancel in relative error norms.

    Args:
      fields: (..., H, W, C>=2) velocity fields; axis -3 is y (rows),
        axis -2 is x (columns), channels (u, v[, ...]).
      dx, dy: physical grid spacing along x (columns) and y (rows).

    Returns:
      (..., H, W) vorticity.
    """
    dv_dx = jnp.gradient(fields[..., 1], axis=-1) / dx
    du_dy = jnp.gradient(fields[..., 0], axis=-2) / dy
    return dv_dx - du_dy


def divergence(
    fields: jnp.ndarray, dx: float = 1.0, dy: float = 1.0
) -> jnp.ndarray:
    """Planar divergence du/dx + dv/dy of 2D velocity fields.

    Incompressibility diagnostic: the governing flows are
    divergence-free (arXiv:2006.04731 §2 solves incompressible
    Navier-Stokes), but neither the generative samples nor the
    grid-interpolated HF reference satisfy it exactly — so the useful
    scalar is the RMS divergence of the prediction RELATIVE to the HF
    reference's own RMS on the same grid/stencil (ratio ~1 = the model
    is as solenoidal as the data it learned from). Central differences
    on the uniform training grid; pass physical spacings as in
    ``vorticity``.

    Args:
      fields: (..., H, W, C>=2) velocity fields; axis -3 is y (rows),
        axis -2 is x (columns), channels (u, v[, ...]).
      dx, dy: physical grid spacing along x (columns) and y (rows).

    Returns:
      (..., H, W) divergence.
    """
    du_dx = jnp.gradient(fields[..., 0], axis=-1) / dx
    dv_dy = jnp.gradient(fields[..., 1], axis=-2) / dy
    return du_dx + dv_dy


def relative_l2(pred: jnp.ndarray, ref: jnp.ndarray, axes=None) -> jnp.ndarray:
    """||pred - ref||_2 / ||ref||_2 over ``axes`` (default: all)."""
    if axes is None:
        axes = tuple(range(ref.ndim))
    num = jnp.sqrt(jnp.sum((pred - ref) ** 2, axis=axes))
    den = jnp.sqrt(jnp.sum(ref**2, axis=axes)) + 1e-12
    return num / den


def energy_spectrum(
    fluct: jnp.ndarray,
    domain: tuple[float, float] | None = None,
    taper: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Radial kinetic-energy spectrum of 2D velocity fluctuations.

    Parity+: spectral comparison of predicted vs HF turbulence — a
    standard turbulence diagnostic beyond the reference's TKE/moment
    set; exposes whether the generative ensemble carries energy at the
    right spatial scales (resolved vs hallucinated small scales).

    Args:
      fluct: (..., H, W, Cv) velocity FLUCTUATION components (mean flow
        removed); leading axes (time/ensemble) are averaged over.
      domain: optional physical extents ``(Ly, Lx)``. When given, modes
        are binned by PHYSICAL radial wavenumber
        ``|k| = sqrt((n_y/Ly)^2 + (n_x/Lx)^2)`` (cycles per unit
        length) in bins of width ``dk = max(1/Ly, 1/Lx)`` (the coarser
        fundamental, so every bin is populated) up to the isotropically
        resolved ``k_max = min(H/(2 Ly), W/(2 Lx))``. This matters on
        the shipped 4:1-aspect domains: index-space binning would
        aggregate modes whose physical wavenumbers differ by the aspect
        ratio (e.g. n=(4,0) at k=1 with n=(0,4) at k=4). None (default)
        = bin by integer mode index (equivalent to ``domain=(1, 1)``).
      taper: apply a 2D Hann window (power-compensated) before the FFT.
        The flow domains are NOT periodic (inflow != outflow), so the
        raw periodic FFT adds a ~k^-2 leakage floor from the boundary
        jump to both spectra; the taper removes it at the cost of
        ~2-bin smearing of sharp modes.

    Returns:
      (k, E): bin-center wavenumbers ``k`` (nbins,) and spectrum ``E``
      (nbins,), normalized so that ``sum(E) = 0.5 * <|u'|^2>_grid``
      restricted to the isotropically-sampled modes ``|k| <= k_max``
      (corner modes beyond that radius are discarded, not folded in;
      with ``taper`` the identity holds in expectation for broadband
      fields, exactly preserving white-noise energy).
    """
    *_, h, w, _c = fluct.shape
    ly, lx = (1.0, 1.0) if domain is None else (
        float(domain[0]), float(domain[1])
    )
    x = fluct.reshape((-1, h, w, _c))
    if taper:
        win = np.hanning(h)[:, None] * np.hanning(w)[None, :]
        # Divide by the RMS window gain so broadband (white) power is
        # preserved exactly and turbulent spectra in expectation.
        win = win / np.sqrt((win**2).mean())
        x = x * jnp.asarray(win, dtype=x.dtype)[None, :, :, None]
    fh = jnp.fft.fft2(x, axes=(1, 2))
    # Mean power over leading axes, summed over velocity components;
    # 1/(HW)^2 makes sum-over-modes equal the grid-mean square
    # (Parseval for the unnormalized FFT).
    ps = (jnp.abs(fh) ** 2).sum(axis=-1).mean(axis=0) / float(h * w) ** 2
    ky = np.fft.fftfreq(h) * h / ly
    kx = np.fft.fftfreq(w) * w / lx
    kr = np.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)
    # Bin width = the SMALLEST fundamental wavenumber, so every nonzero
    # mode lands in bin >= 1 (min nonzero |k| is exactly dk). The
    # max-fundamental choice used before 2026-08-19 folded sub-dk
    # streamwise modes of anisotropic domains (k = 0.25, 0.5 on the 4:1
    # cases) into bin 0, which every consumer discards as "the mean
    # mode" — silently dropping the most energetic wake modes.
    dk = min(1.0 / ly, 1.0 / lx)
    nbins = int(np.floor(min(h / (2 * ly), w / (2 * lx)) / dk)) + 1
    r = np.round(kr / dk).astype(np.int32)
    bins = np.where(r < nbins, r, nbins)  # overflow bin discarded below
    seg = jax.ops.segment_sum(
        ps.ravel(), jnp.asarray(bins.ravel()), num_segments=nbins + 1
    )
    return jnp.arange(nbins, dtype=jnp.float32) * dk, 0.5 * seg[:nbins]


def fluctuation_pdf(
    samples: jnp.ndarray, bins: int = 64, lo: float | None = None,
    hi: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Empirical probability density of pooled scalar samples.

    Parity: the reference's velocity-fluctuation PDF figures
    (arXiv:2006.04731 §4 compares predicted vs HF probability density
    functions of the velocity fluctuations) — this is the histogram
    density behind that figure, pooled over every axis of ``samples``.

    Args:
      samples: fluctuation values, any shape (flattened internally).
      bins: histogram bin count.
      lo, hi: histogram range; default = sample min/max. Pass a COMMON
        range when comparing two PDFs (the predicted and reference
        histograms must share bin edges to be comparable curves).

    Returns:
      (centers, density): bin centers (bins,) and density (bins,)
      normalized so ``sum(density) * bin_width = 1``.
    """
    x = samples.ravel()
    lo = float(x.min()) if lo is None else lo
    hi = float(x.max()) if hi is None else hi
    if hi <= lo:
        # Constant samples (e.g. an identically-zero masked channel):
        # a zero-width range would make every bin width 0 and the
        # density inf/NaN. Widen to an epsilon so the degenerate case
        # stays a representable (single-spike) density.
        hi = lo + max(1e-6, abs(lo) * 1e-6)
    density, edges = jnp.histogram(x, bins=bins, range=(lo, hi), density=True)
    return 0.5 * (edges[:-1] + edges[1:]), density


def wasserstein1(
    a: jnp.ndarray, b: jnp.ndarray, n_quantiles: int = 256
) -> jnp.ndarray:
    """Wasserstein-1 distance between two empirical 1D distributions.

    Scalar companion of the PDF figure (``fluctuation_pdf``): a single
    transport distance between the predicted and reference fluctuation
    distributions, in the same units as the samples. Uses the 1D
    identity W1 = ∫|F_a⁻¹(q) − F_b⁻¹(q)| dq on a midpoint quantile
    grid, so the sample counts of ``a`` and ``b`` may differ (they do:
    the ensemble pools N× more values than the reference) and neither
    an N_a × N_b coupling nor equal-length sorting is materialized.

    Args:
      a, b: samples of each distribution, any shapes (flattened).
      n_quantiles: quantile-grid resolution (midpoint rule).

    Returns: scalar W1 estimate.
    """
    q = (jnp.arange(n_quantiles, dtype=jnp.float32) + 0.5) / n_quantiles
    return jnp.mean(jnp.abs(jnp.quantile(a.ravel(), q) - jnp.quantile(b.ravel(), q)))


def ensemble_crps(
    members: jnp.ndarray, ref: jnp.ndarray, axis: int = 0
) -> jnp.ndarray:
    """Pointwise CRPS of an ensemble forecast (fair/unbiased estimator).

    Parity+: proper-scoring-rule UQ calibration beyond the reference's
    variance maps. Uses the sorted O(N log N) identity for the ensemble
    self-distance term (no N x N pairwise materialization):

        CRPS = mean_i |X_i - y| - sum_{i<j} (X_(j) - X_(i)) / (N(N-1))

    Args:
      members: ensemble samples with member axis ``axis`` (size N >= 2).
      ref: reference field, shape = members without the member axis.

    Returns: CRPS field with the member axis reduced (same units as y).
    """
    x = jnp.moveaxis(members, axis, 0)
    n = x.shape[0]
    if n < 2:
        raise ValueError(
            f"ensemble_crps needs >= 2 members (got {n}); the pairwise "
            "self-distance term is undefined for a single sample"
        )
    t1 = jnp.mean(jnp.abs(x - ref[None]), axis=0)
    xs = jnp.sort(x, axis=0)
    i = jnp.arange(1, n + 1, dtype=xs.dtype).reshape((n,) + (1,) * ref.ndim)
    t2 = jnp.sum((2.0 * i - n - 1.0) * xs, axis=0) / (n * (n - 1))
    return t1 - t2


def gaussian_crps(
    mean: jnp.ndarray, var: jnp.ndarray, ref: jnp.ndarray
) -> jnp.ndarray:
    """Closed-form CRPS under a Gaussian predictive N(mean, var) —
    computable from the rollout's O(1)-memory two-moment stats (no
    member fields needed): sigma * (z(2Phi(z)-1) + 2phi(z) - 1/sqrt(pi))."""
    std = jnp.sqrt(var + 1e-20)
    z = (ref - mean) / std
    cdf = jax.scipy.stats.norm.cdf(z)
    pdf = jax.scipy.stats.norm.pdf(z)
    return std * (z * (2.0 * cdf - 1.0) + 2.0 * pdf - 1.0 / jnp.sqrt(jnp.pi))


def ensemble_coverage(
    members: jnp.ndarray,
    ref: jnp.ndarray,
    levels: tuple[float, ...] = (0.5, 0.8, 0.9, 0.95),
    axis: int = 0,
) -> jnp.ndarray:
    """Empirical coverage of central predictive intervals.

    For each nominal level q, the fraction of points where ``ref``
    falls inside the ensemble's central q-interval (per-point member
    quantiles). A calibrated ensemble returns coverage ~= levels (the
    reliability diagram's y-axis).
    """
    x = jnp.moveaxis(members, axis, 0)
    qs = jnp.asarray(levels)
    # One stacked quantile call: a per-level Python loop would re-sort
    # the full member array once per bound (8 sorts + dispatches for
    # the default 4 levels); the stacked q vector shares one sort.
    bounds = jnp.quantile(
        x, jnp.concatenate([(1.0 - qs) / 2.0, 1.0 - (1.0 - qs) / 2.0]), axis=0
    )
    n = len(levels)
    inside = (ref >= bounds[:n]) & (ref <= bounds[n:])
    return jnp.mean(inside, axis=tuple(range(1, inside.ndim)))


def interval_z(q) -> jnp.ndarray:
    """Two-sided Gaussian z threshold of the central q-interval,
    ndtri((1+q)/2) — the single shared level-to-threshold mapping used
    by both the fit side (calibrate.fit_interval_scales) and the
    evaluation side (gaussian_coverage); keeping one definition is what
    makes fitted factors and evaluated thresholds cancel exactly."""
    return jax.scipy.special.ndtri(0.5 + jnp.asarray(q) / 2.0)


def gaussian_coverage(
    mean: jnp.ndarray,
    var: jnp.ndarray,
    ref: jnp.ndarray,
    levels: tuple[float, ...] = (0.5, 0.8, 0.9, 0.95),
    scales=None,
) -> jnp.ndarray:
    """Coverage under a Gaussian predictive N(mean, var) — the
    two-moment companion of ``ensemble_coverage`` (works directly on
    the rollout stats mode's mean/var). ``scales`` optionally widens
    each level's interval by its own factor (per-level recalibration,
    see calibrate.fit_interval_scales); None = 1 everywhere."""
    z = jnp.abs(ref - mean) / jnp.sqrt(var + 1e-20)
    if scales is None:
        scales = jnp.ones(len(levels))
    elif len(scales) != len(levels):
        # zip would silently truncate, returning coverage for fewer
        # levels than requested — a wrong-shape UQ result.
        raise ValueError(
            f"{len(scales)} scales for {len(levels)} levels; per-level "
            "recalibration factors must match the requested levels"
        )
    out = []
    for q, s in zip(levels, scales):
        out.append(jnp.mean(z <= s * interval_z(q)))
    return jnp.stack(out)


def total_variance(mean_t: jnp.ndarray, var_t: jnp.ndarray) -> jnp.ndarray:
    """Pooled variance of the (time × ensemble) sample population from
    per-step ensemble stats (law of total variance):

        var_pool = var_time(ensemble mean) + mean_time(ensemble var)

    This is the quantity comparable to the HF reference's TEMPORAL
    variance when computing TKE — ensemble variance alone measures a
    different fluctuation and under-reports for a sharp model.

    Args:
      mean_t: (T, ..., C) per-step ensemble means.
      var_t:  (T, ..., C) per-step ensemble variances.
    """
    return jnp.var(mean_t, axis=0) + jnp.mean(var_t, axis=0)
