"""Conditional affine coupling layer with dense-block coupling network.

Parity: SURVEY.md §2 "Affine coupling layer" / arXiv:2006.04731 §3:
channels are split in half; a DenseNet-style CNN on one half —
*conditioned on LF-encoder features and ConvLSTM recurrent features
concatenated into its input* — predicts (scale, shift) for the other
half. logdet = sum log s. The final conv is zero-initialized so each
coupling starts at the identity (Glow training stability trick).

TPU-first: the coupling CNN runs in ``compute_dtype`` (bfloat16 on TPU)
— its convs are the model's FLOPs hot spot (SURVEY.md §3.1) and land on
the MXU. The affine apply is always float32 via the fused kernel
dispatcher (:func:`tpuflow.kernels.coupling_apply`).

Numerics of invertibility (measured on real TPU): in the reverse pass
the net input carries the reconstruction error of *later* layers, and
a conv's discrete rounding responds to any input perturbation with a
jump at its precision floor — so roundtrip error settles at the conv
precision, not at f32 eps. TPU's default f32 conv precision is bf16,
which yields ~1e-3 roundtrip error. Therefore all flow-path convs pin
``precision=HIGHEST`` (exact f32 when dtype is float32 — the <1e-4
reconstruction gate's contract; a no-op for bf16 operands, so the bf16
throughput path pays nothing). bf16 compute_dtype is for the
one-directional hot paths (training = forward-only, sampling =
reverse-only) where exact invertibility is never exercised.
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
        hp = jax.lax.Precision.HIGHEST
        x = x.astype(self.dtype)
        h = nn.Conv(
            self.width, (3, 3), padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32, precision=hp, name="conv_in",
        )(x)
        h = nn.relu(h)
        for i in range(self.layers):
            g = nn.Conv(
                self.growth_rate, (3, 3), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, precision=hp, name=f"dense_{i}",
            )(h)
            g = nn.relu(g)
            h = jnp.concatenate([h, g], axis=-1)
        out = nn.Conv(
            self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32, precision=hp, name="conv_out",
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
