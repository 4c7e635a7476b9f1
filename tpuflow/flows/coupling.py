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


def _to_hwnc(x: jax.Array) -> tuple[jax.Array, tuple[int, ...]]:
    """(..., H, W, C) -> (H, W, N, C) with N = prod(leading dims)."""
    *lead, h, w, c = x.shape
    x = jnp.moveaxis(x, (-3, -2), (0, 1))  # (H, W, *lead, C)
    return x.reshape(h, w, -1, c), tuple(lead)


def _from_hwnc(y: jax.Array, lead: tuple[int, ...]) -> jax.Array:
    h, w, _, c = y.shape
    y = y.reshape(h, w, *lead, c)
    return jnp.moveaxis(y, (0, 1), (-3, -2))


class _HWNCConv(nn.Module):
    """3x3 SAME conv on (H, W, N, C) operands with nn.Conv-compatible
    parameters (kernel HWIO f32, bias (out,)) — swapping layouts never
    touches checkpoints.

    Why this exists (measured on v5e, 2026-08-19): the flow's small-
    channel tensors (6-24 ch) make XLA lay activations out batch-minor
    (batch in the 128 lanes; 64 members fill half of them), and that
    layout propagates into the coupling-net convs, where XLA then picks
    the OutputBatchInLanes conv emitter — 3.1x the cost-model cycles of
    the emitter it picks for the same conv with channels minor
    (653639 vs 210864 for scale0 joint_0). Feeding the convs (H, W, N,
    C) logical operands puts channels back in lanes and batch in
    sublanes; per-flow-step device time measured 627 -> 272 us in the
    rollout-shaped scan context (.verify_layoutbench.py protocol).
    """

    features: int
    use_bias: bool
    dtype: Any
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, x.shape[-1], self.features), jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=("HWNC", "HWIO", "HWNC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(self.dtype)
        return y


class DenseBlockNet(nn.Module):
    """DenseNet-style conv stack in concat-free, output-fused form.

    Two algebraic identities restructure the standard DenseNet coupling
    CNN without changing its function class, each motivated by an
    on-chip (v5e) device-time measurement:

    1. Concat-free (input side): a conv over ``concat(parts)`` equals
       the sum of per-part convs with the kernel split along input
       channels. The concat form spent ~30% of rollout device time on
       XLA layout-conversion copies of concatenated bf16 activations;
       the summed form materializes none of them.
    2. Output-fused (joint per-source convs): each source emits its
       contribution to EVERY later target (growth layers + output
       head) in one conv, since a conv at these shapes costs roughly
       the same for any out-channel count up to a lane tile — fusing
       [32, 32, 32, 12] outputs into one 108-channel conv measured
       ~2.9x faster and fills MXU lanes that small outputs leave idle.
       (Kernel = column blocks of the per-target kernels.)

    Structure: sources (x [, cond]) -> width (h0), then sources
    h0, g_1, ..., g_layers each emit one joint conv; growth layer i
    reads all earlier features; the ``out_channels`` head's columns
    are zero-init (each coupling starts at identity — Glow training
    stability). Exactly one bias per target (carried by source 0's
    conv).
    """

    width: int = 64
    layers: int = 3
    growth_rate: int = 32
    out_channels: int = 8
    dtype: Any = jnp.bfloat16
    # "hwnc" (default): convs consume (H, W, N, C) logical operands so
    # XLA keeps channels in lanes — measured 2.3x faster per flow step
    # than "nhwc" in the rollout context (see _HWNCConv docstring).
    # "nhwc": the plain flax path (A/B reference). Same parameters.
    conv_layout: str = "hwnc"

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array | None = None) -> jax.Array:
        hp = jax.lax.Precision.HIGHEST
        hwnc = self.conv_layout == "hwnc"
        if hwnc:
            x, lead = _to_hwnc(x)
            if cond is not None:
                # The K couplings of a scale transpose the SAME cond
                # tensor — XLA CSE collapses them to one transpose.
                cond, _ = _to_hwnc(cond)
                # A batch-1 cond broadcast against member-batched x
                # must stay batch-1 through its conv (cost / N).

        def conv(p, features, name, use_bias, kernel_init=None):
            if hwnc:
                kw = {"kernel_init": kernel_init} if kernel_init is not None else {}
                return _HWNCConv(
                    features=features, use_bias=use_bias, dtype=self.dtype,
                    name=name, **kw,
                )(p.astype(self.dtype))
            kw = {"kernel_init": kernel_init} if kernel_init is not None else {}
            return nn.Conv(
                features, (3, 3), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, precision=hp,
                use_bias=use_bias, bias_init=nn.initializers.zeros,
                name=name, **kw,
            )(p.astype(self.dtype))

        # conv_in: summed per-source (x [, cond]); a batch-1 cond
        # source stays batch-1 through its conv (cost / ensemble_size).
        h0 = conv(x, self.width, "conv_in_0", use_bias=True)
        if cond is not None:
            h0 = h0 + conv(cond, self.width, "conv_in_1", use_bias=False)
        feats = [nn.relu(h0)]

        # Joint per-source convs: source j emits, in ONE conv, its
        # contribution to every later target (growth layers j..L-1 and
        # the output head). Rationale, measured on v5e: a 3x3 conv at
        # these shapes costs ~the same for any out-channel count up to
        # a lane tile, so emitting [32, 32, 32, 12] as one 108-channel
        # conv instead of four is ~2.9x faster (and fills MXU lanes
        # that 12/32-channel outputs leave 75-90% idle). Function class
        # is identical to per-target convs (kernel = column blocks).
        L = self.layers
        tgt_widths = [self.growth_rate] * L + [self.out_channels]
        acc: list = [None] * (L + 1)

        def add_slices(y, tgt_ids):
            off = 0
            for t in tgt_ids:
                sl = y[..., off : off + tgt_widths[t]]
                off += tgt_widths[t]
                acc[t] = sl if acc[t] is None else acc[t] + sl

        def joint_init(tgt_ids):
            # Output-head columns zero (each coupling starts at the
            # identity — Glow stability); growth columns lecun_normal.
            base = nn.initializers.lecun_normal()

            def init(rng, shape, dtype=jnp.float32):
                k = base(rng, shape, dtype)
                off = 0
                for t in tgt_ids:
                    if t == L:
                        k = k.at[..., off : off + tgt_widths[t]].set(0.0)
                    off += tgt_widths[t]
                return k

            return init

        for j in range(L + 1):
            tgt_ids = list(range(j, L + 1))
            total = sum(tgt_widths[t] for t in tgt_ids)
            y = conv(
                feats[j], total, f"joint_{j}", use_bias=(j == 0),
                kernel_init=joint_init(tgt_ids),
            )
            add_slices(y, tgt_ids)
            if j < L:
                feats.append(nn.relu(acc[j]))
        out = acc[L]
        return _from_hwnc(out, lead) if hwnc else out


class AffineCoupling(nn.Module):
    """y_a = (x_a + t) * sigmoid(raw + 2),  (raw, t) = Net([x_b, cond])."""

    width: int = 64
    layers: int = 3
    growth_rate: int = 32
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False
    conv_layout: str = "hwnc"

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

        st = DenseBlockNet(
            width=self.width,
            layers=self.layers,
            growth_rate=self.growth_rate,
            out_channels=2 * ca,
            dtype=self.dtype,
            conv_layout=self.conv_layout,
            name="net",
        )(xb, cond)
        raw, t = st[..., :ca], st[..., ca:]

        ya, logdet = coupling_apply(
            xa, raw, t, reverse=reverse, use_pallas=self.use_pallas
        )
        y = jnp.concatenate([ya, xb.astype(ya.dtype)], axis=-1)
        return y, logdet
