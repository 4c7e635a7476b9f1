"""Conditional split with learned Gaussian prior.

Parity: SURVEY.md §2 "Split w/ learned prior" / arXiv:2006.04731 §3:
at the end of each scale, half the channels are factored out of the
flow; the factored latent gets a *conditional* diagonal-Gaussian prior
whose mean/log-std are predicted by a zero-initialized conv on the
retained half concatenated with the conditioning features (so the prior
starts at N(0, I)). The final scale uses :class:`ConditionalPrior` on
the whole remaining latent.

Forward returns the factored latent's log-prob folded into the logdet
stream; reverse draws the factored latent from the prior at temperature
tau (the ensemble-UQ knob, SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuflow.flows.layout import LayoutConv
from tpuflow.flows.prior import gaussian_logp, gaussian_sample


class _PriorNet(nn.Module):
    """Zero-init conv producing (mean, log_std) for ``out_channels``.

    LayoutConv keeps nn.Conv's exact parameter tree, so checkpoints
    are identical across flow layouts."""

    out_channels: int
    dtype: Any = jnp.bfloat16
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, h: jax.Array) -> tuple[jax.Array, jax.Array]:
        st = LayoutConv(
            2 * self.out_channels, (3, 3), layout=self.layout,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="prior_conv",
        )(h.astype(self.dtype))
        st = st.astype(jnp.float32)
        mean, log_std = jnp.split(st, 2, axis=-1)
        # Soft-clamp log_std for sampling stability far from init.
        log_std = 2.0 * jnp.tanh(log_std / 2.0)
        return mean, log_std


class ConditionalSplit(nn.Module):
    """Factor out half the channels under a learned conditional prior.

    forward:  z -> (z_keep, z_drop, logp(z_drop | keep, cond)) — the
              factored latent is *returned* (not discarded) so exact
              reconstruction reverse(forward(x)) = x is possible, the
              <1e-4 BASELINE gate (SURVEY.md §3.4).
    reverse:  z_keep -> concat([z_keep, drop]) where drop is the given
              latent (reconstruction) or a prior sample at temperature
              tau (generation).
    """

    dtype: Any = jnp.bfloat16
    layout: str = "nhwc"
    # Truncate generative latent draws at ±z_clip sigma (0 = off) —
    # see flows/prior.py gaussian_sample for the stability rationale.
    z_clip: float = 0.0

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        cond: jax.Array | None = None,
        *,
        reverse: bool = False,
        drop: jax.Array | None = None,
        rng: jax.Array | None = None,
        temperature: float | jax.Array = 1.0,
    ):
        if reverse:
            keep = z
            ck = keep.shape[-1]
            h = keep if cond is None else jnp.concatenate(
                [keep, cond.astype(keep.dtype)], axis=-1
            )
            mean, log_std = _PriorNet(
                ck, dtype=self.dtype, layout=self.layout, name="prior"
            )(h)
            if drop is None:
                drop = gaussian_sample(
                    rng, mean, log_std, temperature, self.z_clip
                )
            out = jnp.concatenate(
                [keep.astype(jnp.float32), drop.astype(jnp.float32)], axis=-1
            )
            return out, -gaussian_logp(drop, mean, log_std, self.layout)

        c = z.shape[-1]
        ck = c // 2
        keep, dropped = z[..., :ck], z[..., ck:]
        h = keep if cond is None else jnp.concatenate(
            [keep, cond.astype(keep.dtype)], axis=-1
        )
        mean, log_std = _PriorNet(
            ck, dtype=self.dtype, layout=self.layout, name="prior"
        )(h)
        logp = gaussian_logp(dropped, mean, log_std, self.layout)
        return keep, dropped, logp


class ConditionalPrior(nn.Module):
    """Learned conditional N(mean, std) base prior for the final latent.

    forward: logp(z | cond); reverse: sample at temperature tau.
    """

    dtype: Any = jnp.bfloat16
    layout: str = "nhwc"
    # Truncate generative latent draws at ±z_clip sigma (0 = off).
    z_clip: float = 0.0

    @nn.compact
    def __call__(
        self,
        z_or_shape,
        cond: jax.Array,
        *,
        reverse: bool = False,
        rng: jax.Array | None = None,
        temperature: float | jax.Array = 1.0,
    ):
        if reverse:
            out_channels = z_or_shape  # static int: channels to draw
            mean, log_std = _PriorNet(
                out_channels, dtype=self.dtype, layout=self.layout,
                name="prior",
            )(cond)
            z = gaussian_sample(rng, mean, log_std, temperature, self.z_clip)
            # NOTE: when z_clip binds (~6e-5 of draws at clip 4) the
            # returned logp is the UNTRUNCATED Gaussian density at the
            # clipped z, not the log-density of the actual
            # truncated-with-boundary-atoms sampling distribution.
            # This is a sample-path diagnostic only (training/NLL never
            # samples); exact self-consistency would require evaluating
            # at the pre-clip draw.
            return z, -gaussian_logp(z, mean, log_std, self.layout)

        z = z_or_shape
        mean, log_std = _PriorNet(
            z.shape[-1], dtype=self.dtype, layout=self.layout, name="prior"
        )(cond)
        return z, gaussian_logp(z, mean, log_std, self.layout)
