"""Autoregressive ensemble rollout and held-out NLL.

Parity: SURVEY.md §3.2 ensemble-inference call stack — for each test
trajectory: N ensemble members with independent recurrent states and
latent draws at temperature tau, stepped autoregressively over T
physical timesteps; outputs feed the UQ statistics. This is the
north-star metric path (rollout steps/sec/chip, BASELINE.json).

TPU-first: the time loop is ONE ``jax.lax.scan`` (O(1) memory carry =
per-member ConvLSTM states + PRNG key, SURVEY.md §5 long-context); the
ensemble axis is a ``jax.vmap`` over states/rngs with the LF frame
broadcast — XLA batches all members into single large convs on the MXU.
On a mesh, sharding the ensemble axis spreads members across chips with
zero communication (SURVEY.md §2 'Ensemble parallelism').

Memory note: ``collect="fields"`` stores all (T, N, H, W, C) samples —
fine for small configs; ``collect="stats"`` accumulates ensemble
mean/variance per step inside the scan (Welford-free two-moment form),
bounding memory at O(T * H * W * C) for 256-step/64-member rollouts
(BASELINE stretch config #5).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tpuflow.models.tmglow import TMGlow, init_lstm_state


def make_ensemble_rollout(
    model: TMGlow,
    n_samples: int,
    temperature: float = 1.0,
    collect: str = "stats",
) -> Callable:
    """Build rollout(variables, lf_traj, rng) for ONE LF trajectory.

    Args:
      lf_traj: (T, h, w, C) normalized LF input sequence.

    Returns (by ``collect``):
      "stats":  dict with mean (T,H,W,C), var (T,H,W,C) over members.
      "fields": (T, N, H, W, C) all ensemble member fields.
    """
    cfg = model.cfg

    def sample_one(variables, lf_t, state, rng):
        return model.apply(
            variables, lf_t, state, rng, temperature,
            method=TMGlow.sample_step,
        )

    # Ensemble axis: map over (state, rng); broadcast (variables, lf_t).
    sample_members = jax.vmap(sample_one, in_axes=(None, None, 0, 0))

    def rollout(variables, lf_traj, rng):
        # Per-member batch axis of size 1 inside vmap => leading dims (N, 1).
        states = init_lstm_state(cfg, (n_samples, 1))

        def step(carry, lf_t):
            states, key = carry
            key, sub = jax.random.split(key)
            member_keys = jax.random.split(sub, n_samples)
            x, states = sample_members(
                variables, lf_t[None], states, member_keys
            )  # x: (N, 1, H, W, C)
            x = x[:, 0]
            if collect == "fields":
                out = x
            else:
                mean = jnp.mean(x, axis=0)
                var = jnp.var(x, axis=0)
                out = (mean, var)
            return (states, key), out

        (_, _), ys = jax.lax.scan(step, (states, rng), lf_traj)
        if collect == "fields":
            return ys  # (T, N, H, W, C)
        mean, var = ys
        return {"mean": mean, "var": var}

    return rollout


def make_nll_eval(model: TMGlow) -> Callable:
    """Build nll(variables, lf_traj, hf_traj) -> (T,B) bits/dim for a
    batch of held-out trajectories (the reference's test-NLL metric,
    SURVEY.md §3.2). lf/hf are batch-major (B, T, ...)."""
    cfg = model.cfg

    def nll(variables, lf_traj, hf_traj):
        b = lf_traj.shape[0]
        state = init_lstm_state(cfg, (b,))
        lf_tm = jnp.moveaxis(lf_traj, 1, 0)
        hf_tm = jnp.moveaxis(hf_traj, 1, 0)

        def step(state, xt):
            lf_t, hf_t = xt
            bpd, state = model.apply(variables, hf_t, lf_t, state)
            return state, bpd

        _, bpds = jax.lax.scan(step, state, (lf_tm, hf_tm))
        return bpds  # (T, B)

    return nll
