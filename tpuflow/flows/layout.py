"""Flow-tensor layout contract: NHWC (classic) vs HWNC (TPU-native).

Why this exists: the rollout hot loop is member-batched (N ensemble
members of small-channel 2D fields). XLA's TPU conv emitter wants
channels minor (lanes) with a large contiguous row dimension; feeding
it (N, H, W, C) logical operands at these shapes either hits a
~3.1x-costlier emitter path or forces XLA to insert per-op relayout
copies (measured 2.3x per flow step, r1).

With ``flow_layout="hwnc"`` the ENTIRE flow path — bijectors, priors,
ConvLSTM state, conditioning — lives in (H, W, N, C) with N the
member/batch axis, so the scan body contains no logical layout
transposes at all. Ensemble statistics reduce over the member axis
directly (no output transpose either); the only NHWC<->HWNC
conversions left are one per step on the training input and the
(cold) single-step public APIs. Honest perf note: end-to-end this is
1.01x over per-coupling transposing — r2 profiling showed XLA already
fused those transposes away (the rollout's async copies are weight
prefetches, not transposes; docs/PERF_NOTES.md). The layout stays
because it is the structurally transpose-free design and measured
never-worse.

Everything here is layout bookkeeping shared by the bijectors:
axis maps for reductions/broadcasts, squeeze patterns, and a conv
module with nn.Conv's exact parameter tree so checkpoints are
layout-independent.

Layouts:
  * "nhwc": (..., H, W, C) — arbitrary leading batch axes (the
    reference-shaped API; SURVEY.md §3 call stacks).
  * "hwnc": (H, W, N, C) — exactly one batch axis at position -2.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

LAYOUTS = ("nhwc", "hwnc")


def check_layout(layout: str) -> str:
    if layout not in LAYOUTS:
        raise ValueError(f"unknown flow layout {layout!r}; expected {LAYOUTS}")
    return layout


def field_axes(layout: str) -> tuple[int, int, int]:
    """Axes of (H, W, C) — the per-element reduction axes for logdet /
    log-prob streams (batch shape passes through)."""
    return (-4, -3, -1) if layout == "hwnc" else (-3, -2, -1)


def batch_shape(x: jax.Array, layout: str) -> tuple[int, ...]:
    """Shape a per-example scalar stream (logdet, logp, bpd) carries."""
    return x.shape[-2:-1] if layout == "hwnc" else x.shape[:-3]


def spatial_hw(x: jax.Array, layout: str) -> tuple[int, int]:
    if layout == "hwnc":
        return x.shape[-4], x.shape[-3]
    return x.shape[-3], x.shape[-2]


def member_axis(layout: str) -> int:
    """The ensemble/batch axis of a 4-D flow tensor."""
    return -2 if layout == "hwnc" else 0


def conv_dimension_numbers(layout: str) -> tuple[str, str, str]:
    if layout == "hwnc":
        return ("HWNC", "HWIO", "HWNC")
    return ("NHWC", "HWIO", "NHWC")


def to_layout(x: jax.Array, layout: str) -> jax.Array:
    """(N, H, W, C) -> the given layout (identity for nhwc)."""
    if layout == "hwnc":
        return jnp.moveaxis(x, 0, 2)  # (H, W, N, C)
    return x


def from_layout(x: jax.Array, layout: str) -> jax.Array:
    """The given layout -> (N, H, W, C) (identity for nhwc)."""
    if layout == "hwnc":
        return jnp.moveaxis(x, 2, 0)
    return x


class LayoutConv(nn.Module):
    """2-D SAME conv over a 4-D tensor in either flow layout.

    Parameter tree is EXACTLY nn.Conv's ({kernel: (kh, kw, in, out)
    f32, bias: (out,)}), so modules switched from nn.Conv to
    LayoutConv (ConvLSTM gates, conditioning projections, prior nets)
    keep checkpoint compatibility across layouts. Compute runs in
    ``dtype`` with Precision.HIGHEST (exact-f32 contract on the flow
    path; a no-op for bf16 operands)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    layout: str = "nhwc"
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim != 4:
            raise ValueError(
                f"LayoutConv expects a 4-D tensor, got shape {x.shape}"
            )
        check_layout(self.layout)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, cin, self.features), jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=conv_dimension_numbers(self.layout),
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y
