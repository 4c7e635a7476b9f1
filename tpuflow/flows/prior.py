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

_LOG2PI = math.log(2.0 * math.pi)


def gaussian_logp(z: jax.Array, mean: jax.Array, log_std: jax.Array) -> jax.Array:
    """Sum of elementwise diagonal-Gaussian log-density over the field
    axes (h, w, c) — batch shape passes through.

    Summing over the LAST THREE axes (not "all but the first") matches
    the logdet convention of every bijector (reductions over
    x.shape[:-3]), so arbitrary batch shapes — e.g. (B, T) with time
    folded into the batch — give a per-element density instead of
    silently collapsing extra batch axes into the sum.

    Args:
      z: (..., h, w, c) latent.
      mean, log_std: broadcastable to z.

    Returns:
      z.shape[:-3] float32 log-probability.
    """
    z = z.astype(jnp.float32)
    mean = mean.astype(jnp.float32)
    log_std = log_std.astype(jnp.float32)
    lp = -0.5 * (_LOG2PI + 2.0 * log_std + jnp.exp(-2.0 * log_std) * (z - mean) ** 2)
    return jnp.sum(lp, axis=(-3, -2, -1))


def gaussian_sample(
    rng: jax.Array,
    mean: jax.Array,
    log_std: jax.Array,
    temperature: float | jax.Array = 1.0,
) -> jax.Array:
    """Draw z ~ N(mean, (temperature * std)^2) — temperature tau of the
    reference's ensemble sampler (SURVEY.md §3.2)."""
    eps = jax.random.normal(rng, mean.shape, dtype=jnp.float32)
    return mean + jnp.exp(log_std) * temperature * eps
