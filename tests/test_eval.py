"""Evaluation tests: ensemble rollout (stats + fields modes), held-out
NLL, physics statistics, ensemble sharding over fake devices
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.configs.config import ModelConfig
from tpuflow.data import generate_case
from tpuflow.eval import (
    divergence,
    ensemble_stats,
    make_ensemble_rollout,
    make_nll_eval,
    relative_l2,
    reynolds_stress_uv,
    tke_field,
    velocity_moments,
    vorticity,
)
from tpuflow.models import TMGlow, init_lstm_state

MC = ModelConfig(
    n_scales=2, n_flow_steps=2, channels=3, hf_shape=(16, 32),
    lf_shape=(4, 8), coupling_width=8, coupling_layers=2, growth_rate=4,
    encoder_width=8, lstm_hidden=8, cond_channels=8,
    compute_dtype="float32", use_pallas=False,
)
T, N = 4, 6


def _variables():
    model = TMGlow(MC)
    lf, hf = generate_case("backward-step", 1, 2, MC.hf_shape, MC.lf_shape, 0)
    state = init_lstm_state(MC, (1,))
    return model, model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]), state
    )


def test_rollout_stats_mode():
    model, variables = _variables()
    lf_traj = jnp.asarray(
        generate_case("backward-step", 1, T, MC.hf_shape, MC.lf_shape, 1)[0][0]
    )
    rollout = jax.jit(make_ensemble_rollout(model, N, temperature=0.8))
    out = rollout(variables, lf_traj, jax.random.PRNGKey(2))
    assert out["mean"].shape == (T, *MC.hf_shape, 3)
    assert out["var"].shape == (T, *MC.hf_shape, 3)
    assert np.all(np.isfinite(out["mean"]))
    assert np.all(out["var"] >= 0)
    # Nonzero spread: members actually differ.
    assert float(out["var"].mean()) > 0


@pytest.mark.slow  # 16-45s on the 1-core bench host
def test_rollout_fields_mode_matches_stats():
    model, variables = _variables()
    lf_traj = jnp.asarray(
        generate_case("backward-step", 1, T, MC.hf_shape, MC.lf_shape, 1)[0][0]
    )
    r_fields = jax.jit(
        make_ensemble_rollout(model, N, temperature=0.8, collect="fields")
    )
    r_stats = jax.jit(make_ensemble_rollout(model, N, temperature=0.8))
    key = jax.random.PRNGKey(3)
    fields = r_fields(variables, lf_traj, key)
    stats = r_stats(variables, lf_traj, key)
    assert fields.shape == (T, N, *MC.hf_shape, 3)
    np.testing.assert_allclose(
        np.mean(fields, axis=1), stats["mean"], atol=1e-5
    )
    np.testing.assert_allclose(np.var(fields, axis=1), stats["var"], atol=1e-5)


def test_nll_eval():
    model, variables = _variables()
    lf, hf = generate_case("backward-step", 2, T, MC.hf_shape, MC.lf_shape, 4)
    nll = jax.jit(make_nll_eval(model))
    bpds = nll(variables, jnp.asarray(lf), jnp.asarray(hf))
    assert bpds.shape == (T, 2)
    assert np.all(np.isfinite(bpds))


def test_physics_stats():
    rng = np.random.default_rng(0)
    fields = rng.normal(size=(N, T, 8, 8, 3)).astype(np.float32)
    es = ensemble_stats(jnp.asarray(fields))
    assert es["mean"].shape == (T, 8, 8, 3)
    k = tke_field(es["var"])
    assert k.shape == (T, 8, 8)
    # TKE of ~N(0,1) fluctuations ≈ 0.5*(1+1) = 1.
    assert 0.7 < float(k.mean()) < 1.3

    m = velocity_moments(jnp.asarray(fields), axes=(0, 1))
    assert m["mean"].shape == (8, 8, 3)
    assert abs(float(m["skew"].mean())) < 0.5
    assert 2.0 < float(m["kurt"].mean()) < 4.0

    err = relative_l2(es["mean"], jnp.zeros_like(es["mean"]) + 1.0)
    assert np.isfinite(float(err))


def test_reynolds_stress_uv():
    """<u'v'> matches the per-point covariance: exact for v = a*u + b
    (cov = a*var(u)), ~0 for independent channels."""
    rng = np.random.default_rng(1)
    u = rng.normal(size=(N, T, 8, 8)).astype(np.float32)
    w = rng.normal(size=(N, T, 8, 8)).astype(np.float32)  # independent of u
    fields = np.stack([u, 2.0 * u + 3.0, w], axis=-1)
    rs = np.asarray(reynolds_stress_uv(jnp.asarray(fields), axes=(0, 1)))
    assert rs.shape == (8, 8)
    np.testing.assert_allclose(rs, 2.0 * u.var(axis=(0, 1)), rtol=1e-4)
    rs_indep = np.asarray(
        reynolds_stress_uv(jnp.asarray(fields[..., [0, 2]]), axes=(0, 1))
    )
    assert np.abs(rs_indep).mean() < 5.0 / np.sqrt(N * T)


def test_vorticity_analytic_fields():
    """w = dv/dx - du/dy on closed-form flows: solid-body rotation
    (u=-y, v=x) has w=2 everywhere; a pure shear (u=y, v=0) has w=-1;
    batch axes pass through."""
    h, w = 12, 10
    y = np.arange(h, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.ones((h, 1), np.float32) * np.arange(w, dtype=np.float32)[None, :]
    p = np.zeros((h, w), np.float32)
    rotation = np.stack([-y, x, p], axis=-1)
    shear = np.stack([y, np.zeros_like(x), p], axis=-1)
    np.testing.assert_allclose(
        np.asarray(vorticity(jnp.asarray(rotation))), 2.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(vorticity(jnp.asarray(shear))), -1.0, atol=1e-5
    )
    batched = jnp.asarray(np.stack([rotation, shear], axis=0)[None])
    out = np.asarray(vorticity(batched))
    assert out.shape == (1, 2, h, w)
    np.testing.assert_allclose(out[0, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 1], -1.0, atol=1e-5)


def test_vorticity_anisotropic_spacing():
    """On an anisotropic grid (dx != dy, like the shipped 4x1-domain
    cases) the physical spacings must weight the two gradient terms:
    solid-body rotation sampled on physical coordinates only yields
    w=2 when dx/dy are passed."""
    h, w = 12, 24
    dx, dy = 4.0 / w, 1.0 / h
    ys = np.arange(h, dtype=np.float32)[:, None] * dy * np.ones((1, w), np.float32)
    xs = np.ones((h, 1), np.float32) * np.arange(w, dtype=np.float32)[None, :] * dx
    p = np.zeros((h, w), np.float32)
    rotation = jnp.asarray(np.stack([-ys, xs, p], axis=-1))
    np.testing.assert_allclose(
        np.asarray(vorticity(rotation, dx=dx, dy=dy)), 2.0, atol=1e-4
    )
    # Unit spacing on the same samples mixes the terms as dx + dy != 2.
    np.testing.assert_allclose(
        np.asarray(vorticity(rotation)), dx + dy, atol=1e-4, rtol=0
    )


def test_divergence_analytic_fields():
    """du/dx + dv/dy on closed-form flows: solid-body rotation (u=-y,
    v=x) is solenoidal (div=0); a uniform expansion (u=x, v=y) has
    div=2; anisotropic spacings weight the terms like vorticity's."""
    h, w = 12, 24
    dx, dy = 4.0 / w, 1.0 / h
    ys = np.arange(h, dtype=np.float32)[:, None] * dy * np.ones((1, w), np.float32)
    xs = np.ones((h, 1), np.float32) * np.arange(w, dtype=np.float32)[None, :] * dx
    p = np.zeros((h, w), np.float32)
    rotation = jnp.asarray(np.stack([-ys, xs, p], axis=-1))
    expansion = jnp.asarray(np.stack([xs, ys, p], axis=-1))
    np.testing.assert_allclose(
        np.asarray(divergence(rotation, dx=dx, dy=dy)), 0.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(divergence(expansion, dx=dx, dy=dy)), 2.0, atol=1e-4
    )
    # Unit spacing on the same samples mis-weights the terms: dx + dy.
    np.testing.assert_allclose(
        np.asarray(divergence(expansion)), dx + dy, atol=1e-4, rtol=0
    )
    batched = np.asarray(divergence(jnp.asarray(
        np.stack([np.asarray(rotation), np.asarray(expansion)], axis=0)
    ), dx=dx, dy=dy))
    assert batched.shape == (2, h, w)


def test_long_horizon_rollout_stats_mode():
    """BASELINE stretch config #5 in miniature: a 256-step rollout in
    stats mode — O(1) scan memory, finite statistics throughout."""
    model, variables = _variables()
    lf_short = generate_case("backward-step", 1, 32, MC.hf_shape, MC.lf_shape, 9)[0][0]
    lf_traj = jnp.asarray(np.concatenate([lf_short] * 8, axis=0))  # 256 steps
    rollout = jax.jit(make_ensemble_rollout(model, 4, temperature=0.7))
    out = rollout(variables, lf_traj, jax.random.PRNGKey(10))
    assert out["mean"].shape[0] == 256
    assert np.all(np.isfinite(out["mean"]))
    assert np.all(np.isfinite(out["var"]))


@pytest.mark.slow  # 16-45s on the 1-core bench host
def test_rollout_ensemble_sharded():
    """Ensemble members shard across the 8 fake devices with identical
    results to unsharded (zero-communication parallelism)."""
    from tpuflow.train.mesh import make_mesh

    model, variables = _variables()
    lf_traj = jnp.asarray(
        generate_case("backward-step", 1, T, MC.hf_shape, MC.lf_shape, 1)[0][0]
    )
    n = 8
    ref = jax.jit(make_ensemble_rollout(model, n, temperature=0.8))(
        variables, lf_traj, jax.random.PRNGKey(5)
    )
    mesh = make_mesh(data=4, ensemble=2)
    sharded = jax.jit(make_ensemble_rollout(model, n, temperature=0.8, mesh=mesh))
    out = sharded(variables, lf_traj, jax.random.PRNGKey(5))
    np.testing.assert_allclose(ref["mean"], out["mean"], atol=1e-5)
    np.testing.assert_allclose(ref["var"], out["var"], atol=1e-5)


def test_energy_spectrum_mode_and_parseval():
    """A single Fourier mode lands in its radial bin; total spectral
    energy matches 0.5*<|u'|^2> (Parseval) for in-range modes."""
    from tpuflow.eval import energy_spectrum

    h, w = 32, 64
    x = np.arange(w) / w
    y = np.arange(h) / h
    u = np.cos(2 * np.pi * 5 * x)[None, :] * np.ones((h, 1))  # kx=5
    v = np.sin(2 * np.pi * 3 * y)[:, None] * np.ones((1, w))  # ky=3
    fluct = np.stack([u, v], axis=-1).astype(np.float32)[None]  # (1,H,W,2)
    k, e = energy_spectrum(jnp.asarray(fluct))
    e = np.asarray(e)
    assert k.shape == e.shape == (h // 2 + 1,)
    # u-mode energy in bin 5, v-mode in bin 3; nothing elsewhere.
    expected_total = 0.5 * float((fluct**2).mean(axis=(0, 1, 2)).sum())
    np.testing.assert_allclose(e.sum(), expected_total, rtol=1e-5)
    np.testing.assert_allclose(e[5], 0.5 * float((u**2).mean()), rtol=1e-5)
    np.testing.assert_allclose(e[3], 0.5 * float((v**2).mean()), rtol=1e-5)
    assert e[[0, 1, 2, 4, 6]].max() < 1e-10


def test_energy_spectrum_physical_binning_and_taper():
    """On an anisotropic domain, modes with equal PHYSICAL wavenumber
    land in the same bin (index-space binning would separate them by
    the aspect ratio); the Hann taper preserves broadband energy."""
    from tpuflow.eval import energy_spectrum

    h, w = 32, 64
    x = np.arange(w) / w
    y = np.arange(h) / h
    # Domain (Ly, Lx) = (1, 4): mode n_x=4 has k_x = 4/4 = 1, the same
    # physical wavenumber as mode n_y=1 (k_y = 1/1 = 1).
    u = np.cos(2 * np.pi * 4 * x)[None, :] * np.ones((h, 1))
    v = np.sin(2 * np.pi * 1 * y)[:, None] * np.ones((1, w))
    fluct = np.stack([u, v], axis=-1).astype(np.float32)[None]
    k, e = energy_spectrum(jnp.asarray(fluct), domain=(1.0, 4.0))
    e = np.asarray(e)
    # dk = min(1/1, 1/4) = 0.25 (smallest fundamental); k_max =
    # min(32/2, 64/8) = 8 -> 33 bins; both modes sit at k=1 -> bin 4.
    np.testing.assert_allclose(np.asarray(k), np.arange(33) * 0.25)
    np.testing.assert_allclose(
        e[4], 0.5 * float((u**2).mean() + (v**2).mean()), rtol=1e-5
    )
    assert e[np.arange(33) != 4].max() < 1e-10

    # Regression (2026-08-19): the longest streamwise mode (n_x=1 ->
    # k=0.25, BELOW the max fundamental 1/Ly=1) must land in bin 1,
    # not be folded into the k=0 mean-mode bin that consumers discard.
    u1 = np.cos(2 * np.pi * 1 * x)[None, :] * np.ones((h, 1))
    f1 = np.stack([u1, np.zeros_like(u1)], axis=-1).astype(np.float32)[None]
    k1, e1 = energy_spectrum(jnp.asarray(f1), domain=(1.0, 4.0))
    e1 = np.asarray(e1)
    assert float(e1[0]) < 1e-10
    np.testing.assert_allclose(e1[1], 0.5 * float((u1**2).mean()), rtol=1e-5)
    # Parseval restricted to |k| <= k_max still holds.
    np.testing.assert_allclose(
        e.sum(), 0.5 * float((fluct**2).mean(axis=(0, 1, 2)).sum()), rtol=1e-5
    )

    # Taper: white-noise total energy is preserved exactly by the RMS
    # window compensation; a pure mode stays peaked at its bin.
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(4, h, w, 2)).astype(np.float32)
    _, e_raw = energy_spectrum(jnp.asarray(noise))
    _, e_tap = energy_spectrum(jnp.asarray(noise), taper=True)
    # The taper redistributes power between modes (incl. the discarded
    # corners), so compare totals loosely but match the raw total's
    # ballpark: both are ~0.5*<|u'|^2> over the kept disc.
    np.testing.assert_allclose(
        np.asarray(e_tap).sum(), np.asarray(e_raw).sum(), rtol=0.15
    )
    _, e_mode = energy_spectrum(jnp.asarray(fluct), (1.0, 4.0), taper=True)
    assert int(np.argmax(np.asarray(e_mode))) == 4  # k=1 at dk=0.25


def test_wasserstein1_and_fluctuation_pdf():
    """W1 of identical samples is ~0, a pure location shift recovers
    the shift (quantile identity), and the PDF integrates to 1 on a
    shared range."""
    from tpuflow.eval import fluctuation_pdf, wasserstein1

    rng = np.random.default_rng(0)
    a = rng.normal(size=20000).astype(np.float32)
    b = (rng.normal(size=5000) + 0.5).astype(np.float32)  # shifted, fewer
    assert float(wasserstein1(jnp.asarray(a), jnp.asarray(a))) < 1e-6
    w1 = float(wasserstein1(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(w1, 0.5, atol=0.05)
    # Symmetry of the transport distance.
    np.testing.assert_allclose(
        w1, float(wasserstein1(jnp.asarray(b), jnp.asarray(a))), rtol=1e-5
    )

    lo, hi = float(min(a.min(), b.min())), float(max(a.max(), b.max()))
    centers, density = fluctuation_pdf(jnp.asarray(a), lo=lo, hi=hi)
    assert centers.shape == density.shape == (64,)
    width = float(centers[1] - centers[0])
    np.testing.assert_allclose(float(density.sum()) * width, 1.0, rtol=1e-4)
    # Shared bin edges: the shifted distribution peaks right of the
    # original on the same axis.
    _, density_b = fluctuation_pdf(jnp.asarray(b), lo=lo, hi=hi)
    assert float(centers[jnp.argmax(density_b)]) > float(
        centers[jnp.argmax(density)]
    )


def test_coverage_scales_length_mismatch_raises():
    """Per-level recalibration factors must match the requested levels
    — silent zip truncation would drop coverage entries."""
    from tpuflow.eval import gaussian_coverage

    mean = jnp.zeros((4, 4))
    var = jnp.ones((4, 4))
    with pytest.raises(ValueError, match="scales for"):
        gaussian_coverage(
            mean, var, mean, levels=(0.5, 0.9, 0.95), scales=jnp.ones(2)
        )


def test_stats_rollout_rejects_single_member():
    """var over one member is identically zero — stats mode refuses,
    fields mode stays available for single-sample generation."""
    from tpuflow.eval.rollout import make_ensemble_rollout

    with pytest.raises(ValueError, match=">= 2 ensemble members"):
        make_ensemble_rollout(TMGlow(MC), 1, 0.7, collect="stats")
    make_ensemble_rollout(TMGlow(MC), 1, 0.7, collect="fields")


def test_ensemble_crps_brute_force_and_gaussian():
    """Sorted-form ensemble CRPS == O(N^2) brute force; large-ensemble
    CRPS converges to the closed-form Gaussian CRPS."""
    from tpuflow.eval import ensemble_crps, gaussian_crps

    rng = np.random.default_rng(1)
    x = rng.normal(size=(7, 4, 5)).astype(np.float64)
    y = rng.normal(size=(4, 5)).astype(np.float64)
    got = np.asarray(ensemble_crps(jnp.asarray(x), jnp.asarray(y)))
    n = x.shape[0]
    t1 = np.abs(x - y[None]).mean(0)
    t2 = np.abs(x[:, None] - x[None, :]).sum((0, 1)) / (2 * n * (n - 1))
    np.testing.assert_allclose(got, t1 - t2, atol=1e-6)

    # Convergence to the analytic Gaussian score.
    xs = rng.normal(loc=0.3, scale=1.7, size=(4000, 16)).astype(np.float64)
    ys = rng.normal(size=(16,)).astype(np.float64)
    ens = np.asarray(ensemble_crps(jnp.asarray(xs), jnp.asarray(ys)))
    gau = np.asarray(
        gaussian_crps(
            jnp.full((16,), 0.3), jnp.full((16,), 1.7**2), jnp.asarray(ys)
        )
    )
    np.testing.assert_allclose(ens, gau, rtol=0.08, atol=0.02)


def test_coverage_calibrated_ensemble():
    """Reference drawn from the same distribution as the members =>
    empirical coverage tracks the nominal levels (both estimators)."""
    from tpuflow.eval import ensemble_coverage, gaussian_coverage

    rng = np.random.default_rng(2)
    members = rng.normal(size=(256, 32, 32)).astype(np.float32)
    ref = rng.normal(size=(32, 32)).astype(np.float32)
    levels = (0.5, 0.8, 0.9, 0.95)
    emp = np.asarray(
        ensemble_coverage(jnp.asarray(members), jnp.asarray(ref), levels)
    )
    gau = np.asarray(
        gaussian_coverage(
            jnp.asarray(members.mean(0)),
            jnp.asarray(members.var(0)),
            jnp.asarray(ref),
            levels,
        )
    )
    np.testing.assert_allclose(emp, np.asarray(levels), atol=0.06)
    np.testing.assert_allclose(gau, np.asarray(levels), atol=0.06)
    assert np.all(np.diff(emp) > -1e-6)  # monotone in the nominal level


def test_spread_scale_recovers_underdispersion():
    """An ensemble whose spread is a known factor too small gets that
    factor back from fit_spread_scale, and scaling the members by it
    restores nominal coverage (eval/calibrate.py contract)."""
    from tpuflow.eval import ensemble_coverage, fit_spread_scale, scale_members

    rng = np.random.default_rng(3)
    true_scale = 2.5
    # Members drawn with std 1/true_scale of the reference's.
    members = (rng.normal(size=(128, 48, 48)) / true_scale).astype(np.float32)
    ref = rng.normal(size=(48, 48)).astype(np.float32)
    s = float(fit_spread_scale(jnp.asarray(members), jnp.asarray(ref)))
    assert abs(s - true_scale) / true_scale < 0.1

    levels = (0.5, 0.8, 0.9, 0.95)
    cal = scale_members(jnp.asarray(members), s)
    cov_raw = np.asarray(
        ensemble_coverage(jnp.asarray(members), jnp.asarray(ref), levels)
    )
    cov_cal = np.asarray(ensemble_coverage(cal, jnp.asarray(ref), levels))
    assert np.all(cov_raw < np.asarray(levels) - 0.15)  # badly undercovered
    np.testing.assert_allclose(cov_cal, levels, atol=0.06)
    # Mean-preserving: field-error metrics unchanged by recalibration.
    np.testing.assert_allclose(
        np.asarray(cal).mean(0), members.mean(0), atol=1e-5
    )


def test_variance_scale_fit_is_finite_ensemble_unbiased():
    """The z-RMS interval fit over-disperses variance statistics at
    small N — for a PERFECTLY calibrated N-member ensemble
    E[z^2] = (N+1)/(N-3) (the 1/chi^2_{N-1} tail), ~2.2 RMS at N=4.
    fit_variance_scale matches ratios of expectations instead and
    must return ~1 for a calibrated ensemble at ANY N, and recover a
    known under-dispersion factor."""
    from tpuflow.eval.calibrate import (
        fit_spread_scale,
        fit_variance_scale,
        fit_variance_scale_from_moments,
        scale_members,
    )

    rng = np.random.default_rng(11)
    for n in (4, 64):
        members = jnp.asarray(
            rng.normal(size=(n, 65536)).astype(np.float32)
        )
        ref = jnp.asarray(rng.normal(size=(65536,)).astype(np.float32))
        s_int = float(fit_spread_scale(members, ref))
        s_var = float(fit_variance_scale(members, ref))
        # Calibrated ensemble: variance fit ~1, interval fit carries
        # the finite-N term (large at N=4, ~3% at N=64).
        assert abs(s_var - 1.0) < 0.1, (n, s_var)
        if n == 4:
            assert s_int > 1.8, s_int  # E[z^2] = (N+1)/(N-3) = 5
        # Underdispersed by 2x: the variance fit recovers the factor
        # and the corrected ensemble's population variance matches
        # truth (up to the (N-1)/N estimator convention handled by the
        # N/(N-1) term in the fit).
        und = jnp.asarray(
            (rng.normal(size=(n, 65536)) / 2.0).astype(np.float32)
        )
        s2 = float(fit_variance_scale(und, ref))
        assert abs(s2 - 2.0) / 2.0 < 0.12, (n, s2)
        var_corr = float(
            scale_members(und, s2).var(axis=0, ddof=1).mean()
        )
        assert abs(var_corr - 1.0) < 0.15, (n, var_corr)
    with pytest.raises(ValueError):
        fit_variance_scale_from_moments(1.0, 1.0, 1)


def test_quantile_map_corrects_distribution_shape():
    """CDF matching fit on one sample set transfers to an iid second
    set: a Laplace 'ensemble' marginal mapped onto a Gaussian
    reference must cut the held-out Wasserstein-1 several-fold, while
    a pure variance rescale (same second moment, wrong shape) cannot
    (eval/calibrate.py fit_quantile_map contract)."""
    from tpuflow.eval.calibrate import apply_quantile_map, fit_quantile_map
    from tpuflow.eval.stats import wasserstein1

    rng = np.random.default_rng(5)
    n = 200_000
    pred_fit = jnp.asarray(rng.laplace(size=n).astype(np.float32))
    ref_fit = jnp.asarray(rng.normal(size=n).astype(np.float32))
    pred_hold = jnp.asarray(rng.laplace(size=n).astype(np.float32))
    ref_hold = jnp.asarray(rng.normal(size=n).astype(np.float32))

    xq, yq = fit_quantile_map(pred_fit, ref_fit)
    assert np.all(np.diff(np.asarray(xq)) > 0)  # invertible knots
    mapped = apply_quantile_map(pred_hold, xq, yq)

    w1_raw = float(wasserstein1(pred_hold, ref_hold))
    # Variance-matched rescale: right magnitude, wrong shape.
    resc = pred_hold * float(ref_fit.std() / pred_fit.std())
    w1_rescaled = float(wasserstein1(resc, ref_hold))
    w1_mapped = float(wasserstein1(mapped, ref_hold))
    assert w1_mapped < w1_rescaled / 3, (w1_raw, w1_rescaled, w1_mapped)
    assert w1_mapped < w1_raw / 3

    # Tail extrapolation: values beyond the fitted range map linearly,
    # not onto the end knot (monotone continuation).
    far = apply_quantile_map(jnp.asarray([50.0]), xq, yq)
    assert float(far[0]) > float(yq[-1]) + 1.0


def test_stratified_quantile_map_fixes_mixture_marginals():
    """A pooled map cannot correct a MIXTURE whose components are
    distorted differently; per-stratum maps can (the backward-step v'
    wake-vs-freestream case). Construct two strata where pred and ref
    differ by opposite scalings — the pooled map leaves residual W1,
    the stratified one removes it on held-out samples."""
    from tpuflow.eval.calibrate import (
        apply_quantile_map,
        apply_quantile_map_stratified,
        fit_quantile_map,
        fit_quantile_map_stratified,
    )
    from tpuflow.eval.stats import wasserstein1

    rng = np.random.default_rng(9)
    n = 100_000
    mk = lambda: (  # noqa: E731 — two-strata (2, n) sample pairs
        jnp.asarray(
            np.stack([rng.normal(size=n) * 2.0, rng.normal(size=n) * 0.5])
            .astype(np.float32)
        ),
        jnp.asarray(
            np.stack([rng.normal(size=n) * 0.5, rng.normal(size=n) * 2.0])
            .astype(np.float32)
        ),
    )
    pred_fit, ref_fit = mk()
    pred_hold, ref_hold = mk()

    xq, yq = fit_quantile_map_stratified(pred_fit, ref_fit)
    assert xq.shape == yq.shape == (2, 65)
    mapped = apply_quantile_map_stratified(pred_hold, xq, yq)

    pxq, pyq = fit_quantile_map(pred_fit, ref_fit)
    pooled = apply_quantile_map(pred_hold, pxq, pyq)

    # Pooled marginals of pred and ref mixtures are IDENTICAL by
    # construction (same two components, swapped), so the pooled map
    # is ~the identity and leaves every stratum's mismatch in place;
    # stratified maps remove it. Score W1 within each stratum.
    def per_stratum_w1(x):
        return np.mean([
            float(wasserstein1(x[s], ref_hold[s])) for s in (0, 1)
        ])

    w1_raw = per_stratum_w1(pred_hold)
    w1_pooled = per_stratum_w1(pooled)
    w1_strat = per_stratum_w1(mapped)
    assert w1_pooled > w1_raw * 0.5  # pooled map can't fix strata
    assert w1_strat < w1_pooled / 5, (w1_raw, w1_pooled, w1_strat)


def test_pooled_zscore_fit_matches_concatenated():
    """The streaming multi-trajectory fit (pool per-trajectory z-scores,
    then fit) must equal fitting on member fields concatenated along
    time — the exact-pooling property cli/evaluate.py relies on to keep
    one trajectory's members live at a time."""
    from tpuflow.eval import (
        ensemble_zscores,
        fit_interval_scales,
        fit_interval_scales_from_z,
        fit_spread_scale,
        fit_spread_scale_from_z,
    )

    rng = np.random.default_rng(7)
    trajs = [
        (
            jnp.asarray(rng.normal(size=(16, 6, 8, 8)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(6, 8, 8)).astype(np.float32)),
        )
        for _ in range(3)
    ]
    m_cat = jnp.concatenate([m for m, _ in trajs], axis=1)
    r_cat = jnp.concatenate([r for _, r in trajs], axis=0)
    z_pool = jnp.concatenate(
        [ensemble_zscores(m, r).ravel() for m, r in trajs]
    )
    np.testing.assert_allclose(
        float(fit_spread_scale_from_z(z_pool)),
        float(fit_spread_scale(m_cat, r_cat)),
        rtol=1e-6,
    )
    levels = (0.5, 0.8, 0.9, 0.95)
    np.testing.assert_allclose(
        np.asarray(fit_interval_scales_from_z(z_pool, levels)),
        np.asarray(fit_interval_scales(m_cat, r_cat, levels)),
        rtol=1e-5,
    )


def test_spread_scale_identity_when_calibrated():
    """A calibrated ensemble fits a scale ~1 (no spurious inflation)."""
    from tpuflow.eval import fit_spread_scale

    rng = np.random.default_rng(4)
    members = rng.normal(size=(256, 32, 32)).astype(np.float32)
    ref = rng.normal(size=(32, 32)).astype(np.float32)
    s = float(fit_spread_scale(jnp.asarray(members), jnp.asarray(ref)))
    assert abs(s - 1.0) < 0.1


@pytest.mark.slow  # 16-45s on the 1-core bench host
def test_batched_rollout_matches_loop():
    """Batched multi-trajectory rollout == per-trajectory loop with the
    same keys (vmap is a pure batching transform), and the data-sharded
    variant over the 8 fake devices reproduces it exactly."""
    from tpuflow.eval import make_batched_ensemble_rollout
    from tpuflow.train.mesh import make_mesh

    model, variables = _variables()
    B = 4
    lf = jnp.asarray(
        generate_case("backward-step", B, T, MC.hf_shape, MC.lf_shape, 7)[0]
    )
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(B)])

    single = jax.jit(make_ensemble_rollout(model, N, temperature=0.8))
    batched = jax.jit(make_batched_ensemble_rollout(model, N, temperature=0.8))
    out = batched(variables, lf, keys)
    assert out["mean"].shape == (B, T, *MC.hf_shape, 3)
    for i in range(B):
        ref = single(variables, lf[i], keys[i])
        np.testing.assert_allclose(out["mean"][i], ref["mean"], atol=1e-5)
        np.testing.assert_allclose(out["var"][i], ref["var"], atol=1e-5)

    mesh = make_mesh(data=4, ensemble=2)
    sharded = jax.jit(
        make_batched_ensemble_rollout(model, N, temperature=0.8, mesh=mesh)
    )
    out_s = sharded(variables, lf, keys)
    np.testing.assert_allclose(out_s["mean"], out["mean"], atol=1e-5)
    np.testing.assert_allclose(out_s["var"], out["var"], atol=1e-5)


def test_interval_scales_heavy_tails():
    """Per-level interval recalibration calibrates EVERY level for
    heavy-tailed residuals where the single spread factor cannot
    (calibrate.py fit_interval_scales contract), and transfers to a
    fresh sample from the same residual distribution."""
    from tpuflow.eval import (
        fit_interval_scales,
        fit_spread_scale,
        scaled_interval_coverage,
    )

    rng = np.random.default_rng(5)
    levels = (0.5, 0.8, 0.9, 0.95)
    members = rng.normal(size=(128, 64, 64)).astype(np.float32)
    # Student-t residuals (df=3): heavy tails relative to the Gaussian
    # ensemble spread.
    ref_fit = rng.standard_t(3, size=(64, 64)).astype(np.float32)
    ref_new = rng.standard_t(3, size=(64, 64)).astype(np.float32)

    iscales = np.asarray(
        fit_interval_scales(jnp.asarray(members), jnp.asarray(ref_fit), levels)
    )
    # Heavy tails demand increasing inflation with the level.
    assert np.all(np.diff(iscales) > 0)

    mean = jnp.asarray(members.mean(0))
    var = jnp.asarray(members.var(0))
    cov_new = np.asarray(
        scaled_interval_coverage(
            mean, var, jnp.asarray(ref_new), jnp.asarray(iscales), levels
        )
    )
    np.testing.assert_allclose(cov_new, levels, atol=0.05)

    # The single RMS factor is tail-dominated for t(3) residuals: it
    # over-covers the central levels (e.g. ~0.64 at nominal 0.50) and
    # its worst-level miscalibration exceeds the per-level fit's.
    s = float(fit_spread_scale(jnp.asarray(members), jnp.asarray(ref_fit)))
    cov_s = np.asarray(
        scaled_interval_coverage(
            mean, var, jnp.asarray(ref_new),
            jnp.asarray([s] * len(levels)), levels,
        )
    )
    assert cov_s[0] > levels[0] + 0.05
    lv = np.asarray(levels)
    assert np.abs(cov_new - lv).max() < np.abs(cov_s - lv).max()


def test_spread_field_recovers_spatial_structure():
    """A per-location inflation field recovers a KNOWN spatially varying
    underdispersion pattern (scalar fit cannot), is shrunk toward the
    global factor at low sample counts, and is clipped at degenerate
    locations (calibrate.fit_spread_field_from_z contract)."""
    from tpuflow.eval.calibrate import (
        ensemble_zscores,
        fit_spread_field_from_z,
        fit_spread_scale_from_z,
    )

    rng = np.random.default_rng(11)
    h, w, n, t = 12, 10, 96, 64
    # True inflation factor varies over the left/right halves.
    true = np.where(np.arange(w)[None, :] < w // 2, 3.0, 1.0)[..., None]
    true = np.broadcast_to(true, (h, w, 1)).astype(np.float32)
    members = (rng.normal(size=(n, t, h, w, 1)) / true).astype(np.float32)
    ref = rng.normal(size=(t, h, w, 1)).astype(np.float32)
    z = ensemble_zscores(jnp.asarray(members), jnp.asarray(ref))  # (t,h,w,1)
    s_field = np.asarray(fit_spread_field_from_z(jnp.asarray(z)))
    assert s_field.shape == (h, w, 1)
    # Halves separate cleanly; the scalar fit lands uselessly between.
    left, right = s_field[:, : w // 2].mean(), s_field[:, w // 2 :].mean()
    assert abs(left - 3.0) / 3.0 < 0.15, left
    assert abs(right - 1.0) < 0.25, right
    s_scalar = float(fit_spread_scale_from_z(jnp.asarray(z).ravel()))
    assert 1.4 < s_scalar < 2.6

    # Shrinkage: with very few pooled samples the field hugs the global.
    s_few = np.asarray(
        fit_spread_field_from_z(jnp.asarray(z[:1]), prior_weight=64.0)
    )
    assert s_few.std() < s_field.std()

    # Clipping: a degenerate location (huge z) saturates at the bound.
    z_deg = np.asarray(z).copy()
    z_deg[:, 0, 0, 0] = 1e6
    s_deg = np.asarray(fit_spread_field_from_z(jnp.asarray(z_deg)))
    assert s_deg[0, 0, 0] == 6.0  # default clip hi


def test_lf_conditioned_qmap_transfers_across_scales():
    """The LF-conditioned self-calibrating map (VERDICT r3 item 6)
    transfers a shape correction across trajectories whose marginals
    differ by a per-trajectory scale — exactly where a global pooled
    quantile map fails. Construction: reference fluctuations are
    Gaussian with per-trajectory scale s_i; the 'ensemble' draws a
    LAPLACE marginal (wrong shape) at half the scale (wrong
    dispersion); the LF std is proportional to the true scale (the
    deploy-available covariate)."""
    import numpy as onp

    from tpuflow.eval.calibrate import (
        apply_lf_conditioned_qmap,
        apply_quantile_map,
        fit_lf_conditioned_qmap,
        fit_quantile_map,
    )
    from tpuflow.eval.stats import wasserstein1

    rng = onp.random.default_rng(0)
    scales = {"fit_a": 1.0, "fit_b": 3.0, "hold": 2.0}
    n = 20_000
    pred, ref, lf_std = {}, {}, {}
    for k, s in scales.items():
        pred[k] = rng.laplace(0.0, 0.5 * s / onp.sqrt(2.0), n)
        ref[k] = rng.normal(0.0, s, n)
        lf_std[k] = 0.7 * s  # LF sees a proportional fluctuation scale

    xq, yq, alpha = fit_lf_conditioned_qmap(
        [pred["fit_a"], pred["fit_b"]],
        [ref["fit_a"], ref["fit_b"]],
        [lf_std["fit_a"], lf_std["fit_b"]],
    )
    # Global pooled map fit on the same data (the r3 failure mode).
    gxq, gyq = fit_quantile_map(
        jnp.asarray(onp.concatenate([pred["fit_a"], pred["fit_b"]])),
        jnp.asarray(onp.concatenate([ref["fit_a"], ref["fit_b"]])),
    )

    h_pred = jnp.asarray(pred["hold"])
    h_ref = jnp.asarray(ref["hold"])
    w1_raw = float(wasserstein1(h_pred, h_ref))
    w1_global = float(wasserstein1(apply_quantile_map(h_pred, gxq, gyq), h_ref))
    w1_lf = float(
        wasserstein1(
            apply_lf_conditioned_qmap(
                h_pred, float(jnp.std(h_pred)), lf_std["hold"], xq, yq, alpha
            ),
            h_ref,
        )
    )
    # The LF-conditioned map fixes most of the raw discrepancy and
    # beats the global map on the held-out scale.
    assert w1_lf < 0.25 * w1_raw, (w1_lf, w1_raw)
    assert w1_lf < 0.6 * w1_global, (w1_lf, w1_global)


@pytest.mark.slow  # 16-45s on the 1-core bench host
def test_rollout_overflow_redraw_smoke():
    """overflow_redraw: identical shapes, finite output, and the
    no-overflow fast path produces valid (different-stream) samples;
    the redraw branch's member-replacement logic is exercised directly
    via its where-mask semantics."""
    from tpuflow.configs.config import ModelConfig
    from tpuflow.eval.rollout import make_ensemble_rollout
    from tpuflow.models import TMGlow, init_lstm_state

    MC = ModelConfig(
        n_scales=2, n_flow_steps=2, hf_shape=(16, 32), lf_shape=(4, 8),
        coupling_width=8, coupling_layers=2, growth_rate=4,
        encoder_width=8, lstm_hidden=8, cond_channels=8,
        compute_dtype="float32",
    )
    model = TMGlow(MC)
    lf = jax.random.normal(jax.random.PRNGKey(0), (4, *MC.lf_shape, 3))
    state = init_lstm_state(MC, (1,))
    hf0 = jnp.zeros((1, *MC.hf_shape, 3))
    variables = model.init(jax.random.PRNGKey(1), hf0, lf[:1], state)

    plain = jax.jit(make_ensemble_rollout(model, 3, 0.8, "fields"))
    guard = jax.jit(
        make_ensemble_rollout(model, 3, 0.8, "fields", overflow_redraw=True)
    )
    a = plain(variables, lf, jax.random.PRNGKey(2))
    b = guard(variables, lf, jax.random.PRNGKey(2))
    assert a.shape == b.shape
    assert np.all(np.isfinite(np.asarray(a)))
    assert np.all(np.isfinite(np.asarray(b)))
    # Stats mode with the guard stays finite too.
    sg = jax.jit(
        make_ensemble_rollout(model, 3, 0.8, "stats", overflow_redraw=True)
    )(variables, lf, jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.asarray(sg["mean"])))
