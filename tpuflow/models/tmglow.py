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
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuflow.configs.config import ModelConfig
from tpuflow.models.conv_lstm import ConvLSTMCell
from tpuflow.models.glow import MultiScaleGlow
from tpuflow.models.lf_encoder import LFEncoder

LSTMState = tuple[tuple[jax.Array, jax.Array], ...]  # per scale (h, c)

_LN2 = math.log(2.0)


def scale_shapes(cfg: ModelConfig) -> list[tuple[int, int]]:
    """Spatial resolution of Glow scale l (after l+1 squeezes)."""
    h, w = cfg.hf_shape
    return [(h >> (l + 1), w >> (l + 1)) for l in range(cfg.n_scales)]


def init_lstm_state(cfg: ModelConfig, batch_shape: tuple[int, ...]) -> LSTMState:
    """Zero ConvLSTM state pytree for a batch (pure function of config,
    no parameters — matches the reference's state init, SURVEY.md §3.1)."""
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
    pyramid → per-scale ConvLSTM update → 1×1 conv projection to
    ``cond_channels`` of concat([enc_feat, lstm_h]).
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
            ConvLSTMCell(hidden=cfg.lstm_hidden, dtype=dtype, name=f"lstm{l}")
            for l in range(cfg.n_scales)
        ]
        self.cond_projs = [
            nn.Conv(
                cfg.cond_channels, (1, 1), dtype=dtype,
                param_dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST, name=f"cond_proj{l}",
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
            name="glow",
        )

    def _condition(
        self, lf_t: jax.Array, state: LSTMState
    ) -> tuple[list[jax.Array], LSTMState]:
        feats = self.encoder(lf_t)
        conds, new_state = [], []
        for l in range(self.cfg.n_scales):
            h, s = self.cells[l](feats[l], state[l])
            cond = self.cond_projs[l](
                jnp.concatenate([feats[l], h.astype(feats[l].dtype)], axis=-1)
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
        bits/dim (the training objective, SURVEY.md §3.1)."""
        conds, state = self._condition(lf_t, state)
        _, logdet, logp = self.glow.forward(hf_t, conds)
        dims = hf_t.shape[-3] * hf_t.shape[-2] * hf_t.shape[-1]
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
        (SURVEY.md §3.2 ensemble-inference hot loop body)."""
        conds, state = self._condition(lf_t, state)
        x, _ = self.glow.reverse(conds, rng=rng, temperature=temperature)
        return x, state

    def encode_step(
        self, hf_t: jax.Array, lf_t: jax.Array, state: LSTMState
    ) -> tuple[list[jax.Array], jax.Array, jax.Array, LSTMState]:
        """x → latents (for invertibility tests / latent-space work)."""
        conds, state = self._condition(lf_t, state)
        latents, logdet, logp = self.glow.forward(hf_t, conds)
        return latents, logdet, logp, state

    def reconstruct_step(
        self, latents: list[jax.Array], lf_t: jax.Array, state: LSTMState
    ) -> tuple[jax.Array, LSTMState]:
        """latents → x. With the same (lf_t, state) as ``encode_step``
        the conditioning is identical, so this is the exact inverse —
        the <1e-4 BASELINE reconstruction gate (SURVEY.md §3.4)."""
        conds, state = self._condition(lf_t, state)
        x, _ = self.glow.reverse(conds, latents=latents)
        return x, state
