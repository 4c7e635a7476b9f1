"""Evaluation layer: autoregressive ensemble rollout, physics
statistics (TKE, velocity moments), held-out NLL, figures
(SURVEY.md L5 / §3.2 call stack)."""

from tpuflow.eval.calibrate import (
    ensemble_zscores,
    fit_interval_scales,
    fit_interval_scales_from_z,
    fit_spread_field_from_z,
    fit_spread_scale,
    fit_spread_scale_from_z,
    scale_members,
    scaled_interval_coverage,
)
from tpuflow.eval.rollout import (
    make_batched_ensemble_rollout,
    make_ensemble_rollout,
    make_nll_eval,
)
from tpuflow.eval.stats import (
    tke_field,
    total_variance,
    velocity_moments,
    reynolds_stress_uv,
    relative_l2,
    ensemble_stats,
    energy_spectrum,
    ensemble_crps,
    gaussian_crps,
    ensemble_coverage,
    gaussian_coverage,
    divergence,
    vorticity,
    fluctuation_pdf,
    wasserstein1,
)

__all__ = [
    "make_ensemble_rollout",
    "make_batched_ensemble_rollout",
    "make_nll_eval",
    "fit_spread_field_from_z",
    "fit_spread_scale",
    "fit_spread_scale_from_z",
    "fit_interval_scales",
    "fit_interval_scales_from_z",
    "ensemble_zscores",
    "scaled_interval_coverage",
    "scale_members",
    "tke_field",
    "total_variance",
    "velocity_moments",
    "relative_l2",
    "reynolds_stress_uv",
    "ensemble_stats",
    "energy_spectrum",
    "ensemble_crps",
    "gaussian_crps",
    "ensemble_coverage",
    "gaussian_coverage",
    "divergence",
    "vorticity",
    "fluctuation_pdf",
    "wasserstein1",
]
