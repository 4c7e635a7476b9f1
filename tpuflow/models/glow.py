"""Multi-scale conditional Glow: L scales × K steps of flow.

Parity: SURVEY.md §2 "TM-Glow model" / §3.3–3.4 and arXiv:2006.04731
§3: each scale squeezes 2×, runs K steps of (ActNorm → invertible 1×1 →
conditional affine coupling), then factors out half the channels under
a learned conditional prior; the final scale puts a conditional base
prior on the whole remaining latent.

Invertibility contract (SURVEY.md §3.4): ``reverse(conds,
latents=forward(x, conds).latents) == x`` to <1e-4 — the BASELINE gate.
Both directions share parameters (setup-style module definition) and
the flow arithmetic is float32 throughout; only the coupling/prior
*networks* run in ``dtype``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuflow.flows import (
    ActNorm,
    AffineCoupling,
    ConditionalPrior,
    ConditionalSplit,
    InvConv1x1LU,
    squeeze2d,
    unsqueeze2d,
)
from tpuflow.flows.layout import batch_shape as _batch_shape


def _per_scale_temperature(temperature, n_scales: int) -> list:
    """Normalize a sampling temperature to one value per scale.

    Scalars (Python floats or 0-d arrays, traced or not) broadcast to
    every scale; an (n_scales,) vector maps entry l to scale l (l=0 is
    the finest-resolution split). The shape check is static, so both
    forms jit cleanly.
    """
    if isinstance(temperature, (int, float)):
        return [temperature] * n_scales
    t = jnp.asarray(temperature)
    if t.ndim == 0:
        return [temperature] * n_scales
    if t.shape != (n_scales,):
        raise ValueError(
            f"per-scale temperature must have shape ({n_scales},), got "
            f"{t.shape}"
        )
    return [t[l] for l in range(n_scales)]


class GlowStep(nn.Module):
    """One step of flow: ActNorm → InvConv1x1(LU) → AffineCoupling."""

    width: int = 64
    layers: int = 3
    growth_rate: int = 32
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False
    conv_layout: str = "hwnc"
    flow_layout: str = "nhwc"

    def setup(self):
        self.actnorm = ActNorm(layout=self.flow_layout)
        self.invconv = InvConv1x1LU(layout=self.flow_layout)
        self.coupling = AffineCoupling(
            width=self.width,
            layers=self.layers,
            growth_rate=self.growth_rate,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            conv_layout=self.conv_layout,
            io_layout=self.flow_layout,
        )

    def __call__(
        self,
        x: jax.Array,
        cond: jax.Array | None,
        *,
        reverse: bool = False,
        w_inv: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        if reverse:
            x, ld2 = self.coupling(x, cond, reverse=True)
            x, ld1 = self.invconv(x, reverse=True, w_inv=w_inv)
            x, ld0 = self.actnorm(x, reverse=True)
        else:
            x, ld0 = self.actnorm(x)
            x, ld1 = self.invconv(x)
            x, ld2 = self.coupling(x, cond)
        return x, ld0 + ld1 + ld2


class MultiScaleGlow(nn.Module):
    """L-scale Glow over NHWC fields with per-scale conditioning.

    forward: x, conds -> (latents, logdet, logp) where ``latents`` is
      the per-scale factored-latent list (last entry = base latent) and
      logp is the total prior log-density (so NLL = -(logp + logdet)).
    reverse: conds, latents (reconstruction) or rng+temperature
      (generation) -> (x, logp of the latents used).
    """

    n_scales: int = 3
    n_steps: int = 8
    in_channels: int = 3
    width: int = 64
    layers: int = 3
    growth_rate: int = 32
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False
    conv_layout: str = "hwnc"
    # Layout of every flow tensor (x, latents, conds) — "hwnc" removes
    # all per-bijector transposes from the hot loops (flows/layout.py).
    flow_layout: str = "nhwc"
    # Truncate generative latent draws at ±z_clip sigma (0 = off) —
    # flows/prior.py gaussian_sample stability rationale.
    z_clip: float = 0.0

    def setup(self):
        steps = []
        splits = []
        for l in range(self.n_scales):
            steps.append(
                [
                    GlowStep(
                        width=self.width,
                        layers=self.layers,
                        growth_rate=self.growth_rate,
                        dtype=self.dtype,
                        use_pallas=self.use_pallas,
                        conv_layout=self.conv_layout,
                        flow_layout=self.flow_layout,
                        name=f"scale{l}_step{k}",
                    )
                    for k in range(self.n_steps)
                ]
            )
            if l < self.n_scales - 1:
                splits.append(
                    ConditionalSplit(
                        dtype=self.dtype, layout=self.flow_layout,
                        z_clip=self.z_clip, name=f"split{l}",
                    )
                )
        self.steps = steps
        self.splits = splits
        self.base_prior = ConditionalPrior(
            dtype=self.dtype, layout=self.flow_layout,
            z_clip=self.z_clip, name="base_prior",
        )

    def __call__(self, x, conds, *, reverse=False, **kw):
        if reverse:
            return self.reverse(conds, **kw)
        return self.forward(x, conds)

    def forward(
        self, x: jax.Array, conds: list[jax.Array]
    ) -> tuple[list[jax.Array], jax.Array, jax.Array]:
        bshape = _batch_shape(x, self.flow_layout)
        logdet = jnp.zeros(bshape, jnp.float32)
        logp = jnp.zeros(bshape, jnp.float32)
        latents: list[jax.Array] = []
        h = x
        for l in range(self.n_scales):
            h = squeeze2d(h, layout=self.flow_layout)
            for step in self.steps[l]:
                h, ld = step(h, conds[l])
                logdet = logdet + ld
            if l < self.n_scales - 1:
                h, drop, lp = self.splits[l](h, conds[l])
                latents.append(drop)
                logp = logp + lp
            else:
                _, lp = self.base_prior(h, conds[l])
                latents.append(h)
                logp = logp + lp
        return latents, logdet, logp

    def reverse(
        self,
        conds: list[jax.Array],
        *,
        latents: list[jax.Array] | None = None,
        rng: jax.Array | None = None,
        temperature: float | jax.Array = 1.0,
        inv_caches: list[list[jax.Array]] | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """``temperature`` is a scalar tau applied to every scale, OR an
        (L,)-vector of PER-SCALE taus: entry l scales the latent drawn
        at scale l (l=0 = the finest-resolution split, l=L-1 = the base
        prior at the coarsest scale). Per-scale control exists because
        the factored latents own disjoint wavenumber bands — the fine
        split carries the high-k content — so fine-scale sampling noise
        can be damped without touching the resolved large scales
        (docs/PARITY.md r3 cylinder spectrum diagnosis)."""
        L = self.n_scales
        if latents is None and rng is None:
            raise ValueError("reverse needs latents (reconstruction) or rng")
        rngs = list(jax.random.split(rng, L)) if rng is not None else [None] * L
        taus = _per_scale_temperature(temperature, L)
        logp = None

        # Base latent at the deepest scale.
        if latents is not None:
            h = latents[-1]
            _, lp = self.base_prior(h, conds[L - 1])
        else:
            h, neg_lp = self.base_prior(
                self.base_channels, conds[L - 1], reverse=True,
                rng=rngs[L - 1], temperature=taus[L - 1],
            )
            lp = -neg_lp
        logp = lp

        for l in range(L - 1, -1, -1):
            if l < L - 1:
                if latents is not None:
                    h, neg_lp = self.splits[l](
                        h, conds[l], reverse=True, drop=latents[l]
                    )
                else:
                    h, neg_lp = self.splits[l](
                        h, conds[l], reverse=True,
                        rng=rngs[l], temperature=taus[l],
                    )
                logp = logp - neg_lp
            for k in range(self.n_steps - 1, -1, -1):
                w_inv = inv_caches[l][k] if inv_caches is not None else None
                h, _ = self.steps[l][k](h, conds[l], reverse=True, w_inv=w_inv)
            h = unsqueeze2d(h, layout=self.flow_layout)
        return h, logp

    @property
    def base_channels(self) -> int:
        # Channel count of the deepest latent: C_in * 4^L squeezing,
        # halved (L-1) times by splits => C_in * 2^(L+1).
        return self.in_channels * (2 ** (self.n_scales + 1))
