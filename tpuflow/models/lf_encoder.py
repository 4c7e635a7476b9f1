"""Low-fidelity conditioning encoder.

Parity: SURVEY.md §2 "LF conditioning encoder" / arXiv:2006.04731 §3:
a CNN encodes the low-fidelity input field into a feature pyramid with
one feature map per Glow scale; those features drive the per-scale
ConvLSTMs, coupling layers, and split priors.

TPU-first design: the reference's strided-conv pyramid assumes the LF
grid divides evenly into every scale resolution. Here a shared conv
trunk runs at LF resolution, then each scale head bilinearly resizes to
its exact Glow-scale resolution (static shapes — XLA lowers the resize
to a dense matmul pair on the MXU) followed by a conv. This handles any
LF:HF grid ratio with no dynamic shapes.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class LFEncoder(nn.Module):
    """LF field (B, h_lf, w_lf, C) -> per-scale features
    [(B, H_l, W_l, width), ...] for each Glow scale resolution."""

    scale_shapes: Sequence[tuple[int, int]]  # (H_l, W_l) per Glow scale
    width: int = 32
    trunk_layers: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, lf: jax.Array) -> list[jax.Array]:
        h = lf.astype(self.dtype)
        for i in range(self.trunk_layers):
            h = nn.Conv(
                self.width, (3, 3), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST, name=f"trunk_{i}",
            )(h)
            h = nn.relu(h)

        feats = []
        for l, (th, tw) in enumerate(self.scale_shapes):
            target = (*h.shape[:-3], th, tw, h.shape[-1])
            g = jax.image.resize(h.astype(jnp.float32), target, "bilinear")
            g = nn.Conv(
                self.width, (3, 3), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST, name=f"head_{l}",
            )(g.astype(self.dtype))
            g = nn.relu(g)
            feats.append(g)
        return feats
