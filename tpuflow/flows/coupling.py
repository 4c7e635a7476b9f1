"""Conditional affine coupling layer with dense-block coupling network.

Parity: SURVEY.md §2 "Affine coupling layer" / arXiv:2006.04731 §3:
channels are split in half; a DenseNet-style CNN on one half —
*conditioned on LF-encoder features and ConvLSTM recurrent features
concatenated into its input* — predicts (scale, shift) for the other
half. logdet = sum log s. The final conv is zero-initialized so each
coupling starts at the identity (Glow training stability trick).

TPU-first: the coupling CNN runs in ``compute_dtype`` (bfloat16 on TPU)
— its convs are the model's FLOPs hot spot (SURVEY.md §3.1). THREE
compute paths share ONE parameter declaration (checkpoints are
identical across paths):

  * fused (``use_pallas=True`` on TPU): the whole coupling — net convs
    as im2col matmuls + affine apply + logdet — runs in one Pallas
    kernel (tpuflow/kernels/coupling_fused.py). This is the r1-VERDICT
    throughput lever: XLA's conv emitters cap at ~22% MXU here
    (C_in=64 fills half the 128 contraction rows) and the flow's
    small-channel tensors anchor batch-minor layouts that either hit a
    3.1x-costlier emitter (nhwc) or need per-coupling transpose copies
    (hwnc — 68% of r1 rollout device time was async-copy).
  * "hwnc" (XLA default): convs see (H, W, N, C) logical operands,
    keeping channels in the 128 MXU lanes (measured 2.3x/flow-step
    over nhwc on v5e).
  * "nhwc": the plain XLA path (A/B reference).

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

from tpuflow.flows.layout import check_layout
from tpuflow.kernels import coupling_apply
from tpuflow.kernels.coupling_fused import fused_available, fused_coupling


def _to_hwnc(x: jax.Array) -> tuple[jax.Array, tuple[int, ...]]:
    """(..., H, W, C) -> (H, W, N, C) with N = prod(leading dims)."""
    *lead, h, w, c = x.shape
    x = jnp.moveaxis(x, (-3, -2), (0, 1))  # (H, W, *lead, C)
    return x.reshape(h, w, -1, c), tuple(lead)


def _from_hwnc(y: jax.Array, lead: tuple[int, ...]) -> jax.Array:
    h, w, _, c = y.shape
    y = y.reshape(h, w, *lead, c)
    return jnp.moveaxis(y, (0, 1), (-3, -2))


class _Conv3x3Params(nn.Module):
    """Parameter holder with nn.Conv's exact tree (kernel HWIO f32,
    optional bias (out,)) — one declaration serves every compute path,
    so switching paths never touches checkpoints."""

    in_features: int
    features: int
    use_bias: bool
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array | None]:
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, self.in_features, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


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

    ``fused_affine``: when set to ``(xa, reverse)``, the whole coupling
    (net + affine + logdet) is dispatched to the fused Pallas kernel
    and the return value is ``(y, logdet)`` instead of the net output.
    Parameters are identical either way.
    """

    width: int = 64
    layers: int = 3
    growth_rate: int = 32
    out_channels: int = 8
    dtype: Any = jnp.bfloat16
    # "hwnc" (default): convs consume (H, W, N, C) logical operands so
    # XLA keeps channels in lanes — measured 2.3x faster per flow step
    # than "nhwc" in the rollout context. "nhwc": the plain XLA path
    # (A/B reference). Same parameters. Ignored by the fused path.
    conv_layout: str = "hwnc"
    # Layout of the tensors as GIVEN ("nhwc" classic, "hwnc" when the
    # whole flow path is hwnc-native — flows/layout.py). When io and
    # compute layout agree, NO boundary transposes are emitted: this is
    # the r2 fix for the ~300 async copies/step that per-coupling
    # transposing cost (68% of profiled rollout device time).
    io_layout: str = "nhwc"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cond: jax.Array | None = None,
        *,
        fused_affine: tuple[jax.Array, bool] | None = None,
    ):
        hp = jax.lax.Precision.HIGHEST
        cb = x.shape[-1]
        L = self.layers
        tgt_widths = [self.growth_rate] * L + [self.out_channels]

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

        # --- one parameter declaration for every compute path ---
        k_in0, b_in0 = _Conv3x3Params(
            in_features=cb, features=self.width, use_bias=True,
            name="conv_in_0",
        )()
        k_in1 = None
        if cond is not None:
            k_in1, _ = _Conv3x3Params(
                in_features=cond.shape[-1], features=self.width,
                use_bias=False, name="conv_in_1",
            )()
        joints: list[tuple[jax.Array, jax.Array | None]] = []
        for j in range(L + 1):
            tgt_ids = list(range(j, L + 1))
            total = sum(tgt_widths[t] for t in tgt_ids)
            cin = self.width if j == 0 else self.growth_rate
            joints.append(
                _Conv3x3Params(
                    in_features=cin, features=total, use_bias=(j == 0),
                    kernel_init=joint_init(tgt_ids), name=f"joint_{j}",
                )()
            )

        # --- fused path: whole coupling in one Pallas kernel ---
        if fused_affine is not None:
            xa, reverse = fused_affine
            h0c = None
            if cond is not None:
                c4 = cond.reshape(-1, *cond.shape[-3:])
                h0c = jax.lax.conv_general_dilated(
                    c4.astype(self.dtype), k_in1.astype(self.dtype),
                    (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=hp,
                )
            return fused_coupling(
                xa, x, h0c,
                k_in0.reshape(9 * cb, self.width), b_in0,
                tuple(kj.reshape(kj.shape[0] * kj.shape[1] * kj.shape[2], -1)
                      for kj, _ in joints),
                joints[0][1],
                width=self.width, growth=self.growth_rate, layers=L,
                net_dtype=self.dtype, reverse=reverse,
            )

        # --- XLA paths (hwnc / nhwc), shared parameters ---
        io_hwnc = check_layout(self.io_layout) == "hwnc"
        hwnc = self.conv_layout == "hwnc"
        if io_hwnc and not hwnc:
            raise ValueError(
                "io_layout='hwnc' requires conv_layout='hwnc' — an "
                "hwnc-native flow with nhwc coupling compute would "
                "reintroduce the per-coupling transposes this layout "
                "exists to remove"
            )
        if hwnc and not io_hwnc:
            x, lead = _to_hwnc(x)
            if cond is not None:
                # The K couplings of a scale transpose the SAME cond
                # tensor — XLA CSE collapses them to one transpose.
                cond, _ = _to_hwnc(cond)
                # A batch-1 cond broadcast against member-batched x
                # must stay batch-1 through its conv (cost / N).

        dims = ("HWNC", "HWIO", "HWNC") if hwnc else ("NHWC", "HWIO", "NHWC")

        def conv(p, kernel, bias):
            y = jax.lax.conv_general_dilated(
                p.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
                "SAME", dimension_numbers=dims, precision=hp,
            )
            if bias is not None:
                y = y + bias.astype(self.dtype)
            return y

        # conv_in: summed per-source (x [, cond]); a batch-1 cond
        # source stays batch-1 through its conv (cost / ensemble_size).
        h0 = conv(x, k_in0, b_in0)
        if cond is not None:
            h0 = h0 + conv(cond, k_in1, None)
        feats = [nn.relu(h0)]

        # Joint per-source convs: source j emits, in ONE conv, its
        # contribution to every later target (growth layers j..L-1 and
        # the output head); see class docstring.
        acc: list = [None] * (L + 1)

        def add_slices(y, tgt_ids):
            off = 0
            for t in tgt_ids:
                sl = y[..., off : off + tgt_widths[t]]
                off += tgt_widths[t]
                acc[t] = sl if acc[t] is None else acc[t] + sl

        for j in range(L + 1):
            kj, bj = joints[j]
            add_slices(conv(feats[j], kj, bj), list(range(j, L + 1)))
            if j < L:
                feats.append(nn.relu(acc[j]))
        out = acc[L]
        return _from_hwnc(out, lead) if (hwnc and not io_hwnc) else out


class AffineCoupling(nn.Module):
    """y_a = (x_a + t) * sigmoid(raw + 2),  (raw, t) = Net([x_b, cond]).

    ``use_pallas=True`` routes the whole coupling through the fused
    Pallas kernel on TPU (falls back to the XLA path elsewhere).
    """

    width: int = 64
    layers: int = 3
    growth_rate: int = 32
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False
    conv_layout: str = "hwnc"
    io_layout: str = "nhwc"

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

        net = DenseBlockNet(
            width=self.width,
            layers=self.layers,
            growth_rate=self.growth_rate,
            out_channels=2 * ca,
            dtype=self.dtype,
            conv_layout=self.conv_layout,
            io_layout=self.io_layout,
            name="net",
        )

        if self.use_pallas and fused_available():
            if self.io_layout == "hwnc":
                # The fused kernel consumes member-major tiles; blocked
                # upstream by ModelConfig validation.
                raise ValueError("use_pallas requires flow_layout='nhwc'")
            return net(xb, cond, fused_affine=(xa, reverse))

        st = net(xb, cond)
        raw, t = st[..., :ca], st[..., ca:]

        ya, logdet = coupling_apply(
            xa, raw, t, reverse=reverse, layout=self.io_layout
        )
        y = jnp.concatenate([ya, xb.astype(ya.dtype)], axis=-1)
        return y, logdet
