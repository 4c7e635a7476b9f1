"""Conditional affine coupling layer with dense-block coupling network.

Parity: SURVEY.md §2 "Affine coupling layer" / arXiv:2006.04731 §3:
channels are split in half; a DenseNet-style CNN on one half —
*conditioned on LF-encoder features and ConvLSTM recurrent features
concatenated into its input* — predicts (scale, shift) for the other
half. logdet = sum log s. The final conv is zero-initialized so each
coupling starts at the identity (Glow training stability trick).

TPU-first: the coupling CNN runs in ``compute_dtype`` (bfloat16 on TPU)
— its convs are the model's FLOPs hot spot (SURVEY.md §3.1) and land on
the MXU. Invertibility is untouched because the *identical* net output
conditions forward and inverse; only the affine apply must be float32,
and that runs through the fused kernel dispatcher
(:func:`tpuflow.kernels.coupling_apply`).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuflow.kernels import coupling_apply


class DenseBlockNet(nn.Module):
    """DenseNet-style conv stack: in -> width, then ``layers`` growing
    concats, then a zero-init 3x3 conv to ``out_channels``."""

    width: int = 64
    layers: int = 3
    growth_rate: int = 32
    out_channels: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        h = nn.Conv(
            self.width, (3, 3), padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32, name="conv_in",
        )(x)
        h = nn.relu(h)
        for i in range(self.layers):
            g = nn.Conv(
                self.growth_rate, (3, 3), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, name=f"dense_{i}",
            )(h)
            g = nn.relu(g)
            h = jnp.concatenate([h, g], axis=-1)
        out = nn.Conv(
            self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32, name="conv_out",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(h)
        return out


class AffineCoupling(nn.Module):
    """y_a = (x_a + t) * sigmoid(raw + 2),  (raw, t) = Net([x_b, cond])."""

    width: int = 64
    layers: int = 3
    growth_rate: int = 32
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cond: jax.Array | None = None,
        *,
        reverse: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        c = x.shape[-1]
        ca = c // 2
        xa, xb = x[..., :ca], x[..., ca:]

        net_in = xb if cond is None else jnp.concatenate(
            [xb, cond.astype(xb.dtype)], axis=-1
        )
        st = DenseBlockNet(
            width=self.width,
            layers=self.layers,
            growth_rate=self.growth_rate,
            out_channels=2 * ca,
            dtype=self.dtype,
            name="net",
        )(net_in)
        raw, t = st[..., :ca], st[..., ca:]

        ya, logdet = coupling_apply(
            xa, raw, t, reverse=reverse, use_pallas=self.use_pallas
        )
        y = jnp.concatenate([ya, xb.astype(ya.dtype)], axis=-1)
        return y, logdet
