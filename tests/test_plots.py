"""Visualization smoke tests: every figure function writes a PNG
(SURVEY.md §2 'Visualization' parity)."""

import numpy as np

from tpuflow.eval.plots import (
    plot_fluctuation_pdf,
    plot_nll_curve,
    plot_prediction_panels,
    plot_energy_spectrum,
    plot_probe_timeseries,
    plot_profiles,
    plot_reliability,
    plot_samples_grid,
    plot_tke,
    plot_vorticity,
)

H, W, C = 16, 32, 3


def test_all_figures_written(tmp_path):
    rng = np.random.default_rng(0)
    lf = rng.normal(size=(4, 8, C)).astype(np.float32)
    hf = rng.normal(size=(H, W, C)).astype(np.float32)
    mean = rng.normal(size=(H, W, C)).astype(np.float32)
    var = rng.random((H, W, C)).astype(np.float32)
    samples = rng.normal(size=(5, H, W, C)).astype(np.float32)

    paths = [
        plot_prediction_panels(tmp_path, lf, hf, mean, var, t=3, channel=1),
        plot_tke(tmp_path, var[..., 0], var[..., 1]),
        plot_samples_grid(tmp_path, samples, hf, t=3),
        plot_profiles(tmp_path, mean, np.sqrt(var), hf),
        plot_nll_curve(tmp_path, np.linspace(2.0, 1.0, 20)),
        plot_energy_spectrum(
            tmp_path,
            np.arange(9.0),
            np.geomspace(1.0, 1e-4, 9),
            np.geomspace(1.2, 2e-4, 9),
        ),
        plot_reliability(
            tmp_path,
            np.array([0.5, 0.8, 0.9, 0.95]),
            np.array([0.48, 0.77, 0.91, 0.96]),
        ),
        plot_probe_timeseries(
            tmp_path,
            rng.normal(size=(12, H, W, C)).astype(np.float32),
            rng.random((12, H, W, C)).astype(np.float32),
            rng.normal(size=(12, H, W, C)).astype(np.float32),
        ),
        plot_vorticity(tmp_path, mean[..., 0], hf[..., 0], t=3),
        plot_fluctuation_pdf(
            tmp_path,
            np.stack([np.linspace(-3, 3, 64)] * 2),
            np.abs(rng.normal(size=(2, 64))).astype(np.float32),
            np.abs(rng.normal(size=(2, 64))).astype(np.float32),
        ),
    ]
    for p in paths:
        assert p.exists() and p.stat().st_size > 1000, p


def test_panels_survive_nan_fields(tmp_path):
    """A diverged rollout (NaN fields) is exactly when the figures must
    still render: the color-scale bound falls back to finite values
    instead of producing blank nan-limits panels."""
    import numpy as np

    from tpuflow.eval.plots import _finite_max, plot_prediction_panels

    assert _finite_max(np.full((4, 4), np.nan)) == 1.0
    assert _finite_max(np.array([[1.0, np.nan], [np.inf, -3.0]])) == 3.0
    f = np.random.default_rng(0).normal(size=(8, 8, 3)).astype(np.float32)
    bad = f.copy()
    bad[2, 2] = np.nan
    out = plot_prediction_panels(tmp_path, f, bad, bad, np.abs(bad), 0)
    assert out.exists() and out.stat().st_size > 0


def test_training_curves_figure(tmp_path):
    """Epoch-averaged train curve + held-out overlay; None-safe when
    logs are missing or empty."""
    from tpuflow.eval.plots import plot_training_curves

    tlog = tmp_path / "train_log.csv"
    tlog.write_text(
        "step,wall_s,epoch,bpd,grad_norm\n"
        "1,0.1,1.0,2.0,5.0\n2,0.2,1.0,1.8,5.0\n3,0.3,2.0,nan,5.0\n"
        "4,0.4,2.0,1.5,5.0\n"
    )
    vlog = tmp_path / "val_log.csv"
    vlog.write_text("step,wall_s,epoch,val_bpd\n2,0.2,1.0,2.2\n4,0.4,2.0,1.9\n")
    p = plot_training_curves(tmp_path / "out", tlog, vlog)
    assert p is not None and p.exists() and p.name == "training_curves.png"

    assert plot_training_curves(tmp_path / "out", tmp_path / "absent.csv") is None
    empty = tmp_path / "empty.csv"
    empty.write_text("step,wall_s,epoch,bpd\n")
    assert plot_training_curves(tmp_path / "out", empty) is None
