"""Physics statistics: TKE, velocity moments, field error norms.

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

import jax.numpy as jnp


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


def relative_l2(pred: jnp.ndarray, ref: jnp.ndarray, axes=None) -> jnp.ndarray:
    """||pred - ref||_2 / ||ref||_2 over ``axes`` (default: all)."""
    if axes is None:
        axes = tuple(range(ref.ndim))
    num = jnp.sqrt(jnp.sum((pred - ref) ** 2, axis=axes))
    den = jnp.sqrt(jnp.sum(ref**2, axis=axes)) + 1e-12
    return num / den


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
