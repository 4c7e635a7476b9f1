"""TM-Glow: transient multi-fidelity conditional Glow surrogate.

Parity: SURVEY.md §2 "TM-Glow model" / §3.1–3.2 call stacks and
arXiv:2006.04731 §3. Composes:

  LF encoder (feature pyramid) → per-scale ConvLSTM (recurrent state
  across physical time) → conditioning features → multi-scale Glow
  (NLL forward / sampling reverse).

TPU-first design: the model exposes *single-timestep* pure functions
(`nll_step`, `sample_step`, `encode_step`, `reconstruct_step`); the
time axis lives OUTSIDE the module as a ``jax.lax.scan`` over these
steps with the ConvLSTM state as carry (see tpuflow/train and
tpuflow/eval). That keeps one compiled step reused across the whole
rollout — no per-timestep retracing, O(1) inference memory.

State layout: tuple over scales of (h, c) float32 arrays with static
shapes, so scan compiles once (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import math


import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuflow.configs.config import ModelConfig
from tpuflow.flows.layout import LayoutConv, from_layout, member_axis, to_layout
from tpuflow.models.conv_lstm import ConvLSTMCell
from tpuflow.models.glow import MultiScaleGlow
from tpuflow.models.lf_encoder import LFEncoder

LSTMState = tuple[tuple[jax.Array, jax.Array], ...]  # per scale (h, c)

_LN2 = math.log(2.0)


def scale_shapes(cfg: ModelConfig) -> list[tuple[int, int]]:
    """Spatial resolution of Glow scale l (after l+1 squeezes)."""
    h, w = cfg.hf_shape
    return [(h >> (l + 1), w >> (l + 1)) for l in range(cfg.n_scales)]


def build_inv_caches(
    cfg: ModelConfig, variables: dict
) -> list[list[jax.Array]]:
    """Precompute every invertible-1x1 W^{-1} from the parameter pytree
    (pure; independent of time). Passing the result into
    ``sample_from_feats`` hoists 2*L*K triangular solves per timestep
    out of autoregressive scans — they serialize on the TPU VPU and are
    loop-invariant."""
    from tpuflow.flows.inv1x1 import compute_w_inv

    params = variables["params"]["glow"]
    buffers = variables["buffers"]["glow"]
    caches: list[list[jax.Array]] = []
    for l in range(cfg.n_scales):
        row = []
        for k in range(cfg.n_flow_steps):
            name = f"scale{l}_step{k}"
            p = params[name]["invconv"]
            b = buffers[name]["invconv"]
            row.append(
                compute_w_inv(p["l"], p["u"], p["log_s"], b["p"], b["sign_s"])
            )
        caches.append(row)
    return caches


def precast_net_params(cfg: ModelConfig, variables: dict) -> dict:
    """Cast every NETWORK parameter to the compute dtype, once.

    Every net conv in the model (coupling/encoder/ConvLSTM/prior) casts
    its kernel with ``kernel.astype(compute_dtype)`` at use, so under a
    ``lax.scan`` the loop prefetches the FULL-precision weights from
    HBM every iteration and casts in-loop — profiled at ~300 f32
    weight-prefetch copies per rollout step behind a ~1.5 ms exposed
    stall (docs/PERF_NOTES.md "async copies"). Casting the parameter
    pytree BEFORE the scan stores bf16 weights in HBM and halves those
    prefetch bytes; the in-loop ``astype`` becomes a no-op, so results
    are BIT-IDENTICAL (same cast, applied earlier).

    Flow-ARITHMETIC parameters are exempt and stay f32: actnorm
    scale/bias and inv-1x1 LU factors participate in the invertibility
    contract directly (not through a net output) and are consumed in
    f32 (SURVEY.md §7 hard part 1).

    No-op when compute_dtype is float32.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    if dtype == jnp.float32:
        return variables

    def cast(path, leaf):
        keys = {getattr(k, "key", None) for k in path}
        if keys & {"actnorm", "invconv"}:
            return leaf
        return leaf.astype(dtype) if leaf.dtype == jnp.float32 else leaf

    return {
        **variables,
        "params": jax.tree_util.tree_map_with_path(
            cast, variables["params"]
        ),
    }


def init_lstm_state(cfg: ModelConfig, batch_shape: tuple[int, ...]) -> LSTMState:
    """Zero ConvLSTM state pytree for a batch (pure function of config,
    no parameters — matches the reference's state init, SURVEY.md §3.1).
    Under ``flow_layout="hwnc"`` states are (H_l, W_l, N, hidden)."""
    if cfg.flow_layout == "hwnc":
        if len(batch_shape) != 1:
            raise ValueError(
                f"hwnc flow layout carries exactly one batch axis, got "
                f"batch_shape={batch_shape}"
            )
        return tuple(
            (
                jnp.zeros((sh, sw, batch_shape[0], cfg.lstm_hidden), jnp.float32),
                jnp.zeros((sh, sw, batch_shape[0], cfg.lstm_hidden), jnp.float32),
            )
            for sh, sw in scale_shapes(cfg)
        )
    return tuple(
        (
            jnp.zeros((*batch_shape, sh, sw, cfg.lstm_hidden), jnp.float32),
            jnp.zeros((*batch_shape, sh, sw, cfg.lstm_hidden), jnp.float32),
        )
        for sh, sw in scale_shapes(cfg)
    )


class TMGlow(nn.Module):
    """Single-timestep TM-Glow. All methods are pure given variables.

    Conditioning path (shared by every method): LF frame → encoder
    pyramid → per-scale ConvLSTM update → summed 1×1 projections of
    (enc_feat, lstm_h) to ``cond_channels``.
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        shapes = scale_shapes(cfg)
        self.encoder = LFEncoder(
            scale_shapes=tuple(shapes), width=cfg.encoder_width, dtype=dtype,
            name="encoder",
        )
        self.cells = [
            ConvLSTMCell(
                hidden=cfg.lstm_hidden, dtype=dtype,
                layout=cfg.flow_layout, name=f"lstm{l}",
            )
            for l in range(cfg.n_scales)
        ]
        # Split conditioning projection (sum of 1x1 convs instead of a
        # conv over concat): the encoder-feature side can stay batch-1
        # under ensemble batching, and no concat is materialized.
        self.cond_proj_f = [
            LayoutConv(
                cfg.cond_channels, (1, 1), layout=cfg.flow_layout,
                dtype=dtype, name=f"cond_projf{l}",
            )
            for l in range(cfg.n_scales)
        ]
        self.cond_proj_h = [
            LayoutConv(
                cfg.cond_channels, (1, 1), layout=cfg.flow_layout,
                dtype=dtype, use_bias=False, name=f"cond_projh{l}",
            )
            for l in range(cfg.n_scales)
        ]
        self.glow = MultiScaleGlow(
            n_scales=cfg.n_scales,
            n_steps=cfg.n_flow_steps,
            in_channels=cfg.channels,
            width=cfg.coupling_width,
            layers=cfg.coupling_layers,
            growth_rate=cfg.growth_rate,
            dtype=dtype,
            use_pallas=cfg.use_pallas,
            conv_layout=cfg.conv_layout,
            flow_layout=cfg.flow_layout,
            z_clip=cfg.z_clip,
            name="glow",
        )

    def _condition(
        self, lf_t: jax.Array, state: LSTMState
    ) -> tuple[list[jax.Array], LSTMState]:
        feats = self.encoder(lf_t)  # NHWC pyramid (encoder is NHWC-only)
        conds, new_state = [], []
        for l in range(self.cfg.n_scales):
            # Under hwnc flow layout the (B, h, w, F) feature transposes
            # here, ONCE per scale per step — the flow itself then runs
            # transpose-free (flows/layout.py).
            f = to_layout(feats[l], self.cfg.flow_layout)
            h, s = self.cells[l](f, state[l])
            cond = self.cond_proj_f[l](f) + self.cond_proj_h[l](
                h.astype(f.dtype)
            )
            conds.append(cond)
            new_state.append(s)
        return conds, tuple(new_state)

    def __call__(self, hf_t, lf_t, state):
        """Default method (used by ``model.init``): the NLL step."""
        return self.nll_step(hf_t, lf_t, state)

    def nll_step(
        self, hf_t: jax.Array, lf_t: jax.Array, state: LSTMState
    ) -> tuple[jax.Array, LSTMState]:
        """Forward (normalizing) direction → per-example NLL in
        bits/dim (the training objective, SURVEY.md §3.1). hf_t/lf_t
        arrive batch-major (B, H, W, C) in EITHER flow layout — the
        internal-layout conversion is one transpose per step here,
        not ~2 per bijector."""
        dims = hf_t.shape[-3] * hf_t.shape[-2] * hf_t.shape[-1]
        conds, state = self._condition(lf_t, state)
        _, logdet, logp = self.glow.forward(
            to_layout(hf_t, self.cfg.flow_layout), conds
        )
        bpd = -(logp + logdet) / (dims * _LN2)
        return bpd, state

    def sample_step(
        self,
        lf_t: jax.Array,
        state: LSTMState,
        rng: jax.Array,
        temperature: float | jax.Array = 1.0,
    ) -> tuple[jax.Array, LSTMState]:
        """Reverse (generative) direction: one autoregressive HF sample
        (SURVEY.md §3.2 ensemble-inference hot loop body). Returns x
        batch-major (N, H, W, C) in either flow layout; the rollout
        fast path (``sample_from_feats``) keeps the internal layout
        instead."""
        conds, state = self._condition(lf_t, state)
        x, _ = self.glow.reverse(conds, rng=rng, temperature=temperature)
        return from_layout(x, self.cfg.flow_layout), state

    def nll_and_sample_step(
        self,
        hf_t: jax.Array,
        lf_t: jax.Array,
        state: LSTMState,
        rng: jax.Array,
        temperature: float | jax.Array = 1.0,
        n_members: int = 4,
    ) -> tuple[jax.Array, jax.Array, LSTMState]:
        """One timestep of BOTH directions under ONE conditioning pass:
        teacher-forced NLL (training anchor) plus ``n_members``
        generative draws (the dispersion/spectral fine-tune signal —
        VERDICT r3 items 1-2: put sample-path statistics in the
        training loop instead of post-hoc calibration).

        The ConvLSTM state evolves from LF features only (never from
        hf_t or sampled output — see ``_condition``), so the teacher
        and sample paths share the *identical* conditioning trajectory;
        members need no per-member state. Members fold into the batch
        axis of one ``glow.reverse`` call (conds repeated n_members
        times) so the MXU sees one large batch instead of an unrolled
        member loop.

        Returns (bpd (B,), members (B, n_members, H, W, C) batch-major,
        new_state).
        """
        dims = hf_t.shape[-3] * hf_t.shape[-2] * hf_t.shape[-1]
        conds, state = self._condition(lf_t, state)
        _, logdet, logp = self.glow.forward(
            to_layout(hf_t, self.cfg.flow_layout), conds
        )
        bpd = -(logp + logdet) / (dims * _LN2)

        b_ax = member_axis(self.cfg.flow_layout)
        conds_m = [jnp.repeat(c, n_members, axis=b_ax) for c in conds]
        x_m, _ = self.glow.reverse(
            conds_m, rng=rng, temperature=temperature
        )
        x_m = from_layout(x_m, self.cfg.flow_layout)  # (B*M, H, W, C)
        members = x_m.reshape(
            hf_t.shape[0], n_members, *x_m.shape[1:]
        )  # repeat is consecutive per batch element -> (B, M, ...)
        return bpd, members, state

    def encode_lf(self, lf: jax.Array) -> list[jax.Array]:
        """LF frame(s) -> encoder feature pyramid. Batch-generic: pass
        a whole (T, h, w, C) trajectory to encode every step in one
        batched conv pass (rollout fast path — the encoder is
        member-independent, so computing it under the ensemble batch
        would be n_samples-fold redundant)."""
        return self.encoder(lf)

    def sample_from_feats(
        self,
        feats: list[jax.Array],
        state: LSTMState,
        rng: jax.Array,
        temperature: float | jax.Array = 1.0,
        inv_caches: list[list[jax.Array]] | None = None,
    ) -> tuple[jax.Array, LSTMState]:
        """Ensemble-batched sample step from precomputed encoder
        features (the rollout hot loop body).

        feats are unbatched (h_l, w_l, F) or batch-1 batch-major;
        state carries the member axis N. Returns x in the INTERNAL
        flow layout ((N,H,W,C) nhwc / (H,W,N,C) hwnc) — the rollout
        reduces ensemble stats over the member axis directly, so no
        per-step output transpose exists in the hot loop. One rng draws iid latents for all members at
        once (equivalent to per-member keys: batched normal draws are
        independent across the batch axis). inv_caches (see
        build_inv_caches) skips the per-step LU triangular solves.
        """
        conds, new_state = [], []
        hwnc = self.cfg.flow_layout == "hwnc"
        for l in range(self.cfg.n_scales):
            f = feats[l]
            if f.ndim == 3:
                # (h, w, F) -> batch-1 in the flow layout (pure reshape
                # under hwnc: the batch axis lands at -2).
                f = f[:, :, None, :] if hwnc else f[None]
            else:
                f = to_layout(f, self.cfg.flow_layout)
            # f stays batch-1: its convs (LSTM gates_x, cond_proj_f)
            # broadcast against the member-batched hidden-state side,
            # so the shared-input work is paid once, not per member.
            h, s = self.cells[l](f, state[l])
            cond = self.cond_proj_f[l](f) + self.cond_proj_h[l](
                h.astype(f.dtype)
            )
            conds.append(cond)
            new_state.append(s)
        x, _ = self.glow.reverse(
            conds, rng=rng, temperature=temperature, inv_caches=inv_caches
        )
        return x, tuple(new_state)

    def encode_step(
        self, hf_t: jax.Array, lf_t: jax.Array, state: LSTMState
    ) -> tuple[list[jax.Array], jax.Array, jax.Array, LSTMState]:
        """x → latents (for invertibility tests / latent-space work).
        hf_t arrives batch-major; latents come back in the INTERNAL
        flow layout (reconstruct_step consumes them as-is)."""
        conds, state = self._condition(lf_t, state)
        latents, logdet, logp = self.glow.forward(
            to_layout(hf_t, self.cfg.flow_layout), conds
        )
        return latents, logdet, logp, state

    def reconstruct_step(
        self, latents: list[jax.Array], lf_t: jax.Array, state: LSTMState
    ) -> tuple[jax.Array, LSTMState]:
        """latents → x. With the same (lf_t, state) as ``encode_step``
        the conditioning is identical, so this is the exact inverse —
        the <1e-4 BASELINE reconstruction gate (SURVEY.md §3.4).
        Latents are internal-layout (from ``encode_step``); x returns
        batch-major (B, H, W, C)."""
        conds, state = self._condition(lf_t, state)
        x, _ = self.glow.reverse(conds, latents=latents)
        return from_layout(x, self.cfg.flow_layout), state
