"""ActNorm — per-channel affine with data-dependent initialization.

Parity: standard Glow component used by the reference
(SURVEY.md §2 "ActNorm"; Kingma & Dhariwal 2018 §3.1): after init, the
first batch's post-activation statistics give zero mean / unit variance
per channel; logdet = H*W * sum(log_scale).

TPU-first design: the reference's stateful "initialize on first
forward" mutation does not exist in functional JAX. Instead the
data-dependent statistics are computed *inside the linen parameter
initializers*, which close over the batch passed to ``model.init`` —
initialization therefore sees true post-preceding-layer activations
(the same semantics as the reference), but the resulting module is a
pure function afterwards (SURVEY.md §7 hard part 1). ``model.init``
must trace the forward (normalizing) direction.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuflow.flows.layout import batch_shape, spatial_hw


class ActNorm(nn.Module):
    """Invertible per-channel affine: y = (x + bias) * exp(log_scale).

    Forward returns (y, logdet) with logdet shaped like the batch axes;
    reverse returns (x, -logdet). ``layout`` names the flow-tensor
    layout (flows/layout.py); the data-dependent init statistics reduce
    over all non-channel axes, so parameters are layout-independent.
    """

    eps: float = 1e-6
    layout: str = "nhwc"

    @nn.compact
    def __call__(
        self, x: jax.Array, *, reverse: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        c = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        def bias_init(rng, shape):
            del rng, shape
            return -jnp.mean(x.astype(jnp.float32), axis=reduce_axes)

        def log_scale_init(rng, shape):
            del rng, shape
            std = jnp.std(x.astype(jnp.float32), axis=reduce_axes)
            # Clamp: a (near-)constant channel in the init batch (e.g.
            # a masked solid region) would otherwise initialize a ~1e6
            # amplification (-log(eps)) that saturates the bf16
            # coupling nets and NaNs the first step. exp(7) ~ 1100 is
            # still a strong whitening but keeps activations finite.
            return jnp.clip(-jnp.log(std + self.eps), -7.0, 7.0)

        bias = self.param("bias", bias_init, (c,))
        log_scale = self.param("log_scale", log_scale_init, (c,))

        h, w = spatial_hw(x, self.layout)
        logdet = jnp.broadcast_to(
            h * w * jnp.sum(log_scale), batch_shape(x, self.layout)
        ).astype(jnp.float32)

        x32 = x.astype(jnp.float32)
        if reverse:
            y = x32 * jnp.exp(-log_scale) - bias
            return y, -logdet
        y = (x32 + bias) * jnp.exp(log_scale)
        return y, logdet
