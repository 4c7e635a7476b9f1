"""Conditional ConvLSTM cell — the transient "T" in TM-Glow.

Parity: SURVEY.md §2 "Conditional ConvLSTM recurrence" /
arXiv:2006.04731 §3: one ConvLSTM per Glow scale carries (h, c) across
physical time steps, consuming the LF-encoder feature at that scale;
its hidden state conditions the coupling layers and split priors.

TPU-first design: the cell is a pure function (x, (h, c)) -> (h', (h',
c')) so it threads through ``jax.lax.scan`` as carry state (SURVEY.md
§5 long-context: O(1)-memory autoregressive recurrence). The gate conv
runs in ``dtype`` (bf16 on TPU, MXU-bound); the cell state is held and
updated in float32 so long rollouts don't drift.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuflow.flows.layout import LayoutConv

State = tuple[jax.Array, jax.Array]  # (h, c), float32


class ConvLSTMCell(nn.Module):
    """Single-step ConvLSTM with split input/hidden gate convs:
    gates = W_x * x + W_h * h (the classic two-kernel formulation).

    The split (vs one conv over concat([x, h])) lets a broadcast-shared
    input x stay batch-1 through its conv while h carries the ensemble
    axis — the W_x work is paid once, not per member — and avoids
    materializing the concatenated activation (measured ~30% of rollout
    device time was XLA layout copies of such tensors).

    ``layout`` (flows/layout.py): under "hwnc" x/h/c are (H, W, N, ch)
    and the gate convs run natively in that layout — LayoutConv keeps
    nn.Conv's parameter tree, so checkpoints are layout-independent."""

    hidden: int
    kernel: tuple[int, int] = (3, 3)
    forget_bias: float = 1.0
    dtype: Any = jnp.bfloat16
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, x: jax.Array, state: State) -> tuple[jax.Array, State]:
        h, c = state
        gates = LayoutConv(
            4 * self.hidden, self.kernel, layout=self.layout,
            dtype=self.dtype, name="gates_x",
        )(x.astype(self.dtype)) + LayoutConv(
            4 * self.hidden, self.kernel, layout=self.layout,
            dtype=self.dtype, use_bias=False, name="gates_h",
        )(h.astype(self.dtype))
        gates = gates.astype(jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = (
            jax.nn.sigmoid(f + self.forget_bias) * c.astype(jnp.float32)
            + jax.nn.sigmoid(i) * jnp.tanh(g)
        )
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, (h_new, c_new)
