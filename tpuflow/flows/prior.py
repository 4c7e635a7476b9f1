"""Diagonal-Gaussian prior helpers for split latents and the base prior.

Parity: the reference's conditional Gaussian priors at each Glow split
(SURVEY.md §2 "Split w/ learned prior"; arXiv:2006.04731 §3 — factored
latents get priors whose mean/log-variance are predicted by a conv on
retained features + conditioning).

All log-densities are float32 regardless of network compute dtype: the
NLL objective is the training signal and must not accumulate in bf16.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tpuflow.flows.layout import field_axes

_LOG2PI = math.log(2.0 * math.pi)


def gaussian_logp(
    z: jax.Array,
    mean: jax.Array,
    log_std: jax.Array,
    layout: str = "nhwc",
) -> jax.Array:
    """Sum of elementwise diagonal-Gaussian log-density over the field
    axes (h, w, c) — batch shape passes through.

    Summing over the FIELD axes only (not "all but the first") matches
    the logdet convention of every bijector, so arbitrary batch shapes
    — e.g. (B, T) with time folded into the batch under nhwc — give a
    per-element density instead of silently collapsing extra batch axes
    into the sum. ``layout`` picks the field axes (flows/layout.py).

    Args:
      z: (..., h, w, c) latent (nhwc) or (h, w, n, c) (hwnc).
      mean, log_std: broadcastable to z.

    Returns:
      batch-shaped float32 log-probability.
    """
    z = z.astype(jnp.float32)
    mean = mean.astype(jnp.float32)
    log_std = log_std.astype(jnp.float32)
    lp = -0.5 * (_LOG2PI + 2.0 * log_std + jnp.exp(-2.0 * log_std) * (z - mean) ** 2)
    return jnp.sum(lp, axis=field_axes(layout))


def gaussian_sample(
    rng: jax.Array,
    mean: jax.Array,
    log_std: jax.Array,
    temperature: float | jax.Array = 1.0,
    z_clip: float = 0.0,
) -> jax.Array:
    """Draw z ~ N(mean, (temperature * std)^2) — temperature tau of the
    reference's ensemble sampler (SURVEY.md §3.2).

    ``z_clip > 0`` truncates the standard-normal draw at ±z_clip sigma
    (clipped, not resampled). Stability rationale (measured, see
    docs/PAPER_PARITY.md "Sampling stability"): out-of-distribution
    latents are amplified superexponentially through the reverse
    coupling stack (each reverse step multiplies by 1/sigmoid(raw+2),
    unbounded for OOD net inputs), and large-ensemble long-horizon
    rollouts at tau = 1.0 sample the tail often enough to overflow
    (64 members x 100 steps ~ 5e8 draws/channel). Truncation bounds
    the excursion at negligible distribution cost (P(|eps| > 4) ~
    6e-5). It is tail insurance, NOT an OOD rescue: at tau >= 1.15
    the BULK of the latent distribution is out-of-distribution for
    the trained coupling nets and rollouts diverge regardless of
    clipping (measured on the r2 converged checkpoint).
    """
    eps = jax.random.normal(rng, mean.shape, dtype=jnp.float32)
    if z_clip > 0.0:
        eps = jnp.clip(eps, -z_clip, z_clip)
    return mean + jnp.exp(log_std) * temperature * eps
