"""Autoregressive ensemble rollout and held-out NLL.

Parity: SURVEY.md §3.2 ensemble-inference call stack — for each test
trajectory: N ensemble members with independent recurrent states and
latent draws at temperature tau, stepped autoregressively over T
physical timesteps; outputs feed the UQ statistics. This is the
north-star metric path (rollout steps/sec/chip, BASELINE.json).

TPU-first: the time loop is ONE ``jax.lax.scan`` (O(1) memory carry =
per-member ConvLSTM states + PRNG key, SURVEY.md §5 long-context); the
ensemble is a plain leading batch axis of the member-dependent compute
(ConvLSTM + Glow reverse) so all members ride single large MXU convs —
one PRNG key per step draws iid latents for the whole ensemble (batched
normal draws are independent across the batch axis, exactly equivalent
to per-member keys). On a mesh, sharding the ensemble axis spreads
members across chips with zero communication (SURVEY.md §2 'Ensemble
parallelism').

Three scan-invariant hoists keep the hot loop lean:
  * the LF encoder runs ONCE for the whole trajectory (T as batch)
    before the scan — it is member-independent;
  * every inv-1x1 W^{-1} is precomputed (build_inv_caches), removing
    2*L*K serializing triangular solves per step;
  * parameters are closed over, so XLA keeps them resident.

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
    mesh=None,
    unroll: int = 1,
    overflow_redraw: bool = False,
) -> Callable:
    """Build rollout(variables, lf_traj, rng) for ONE LF trajectory.

    Args:
      lf_traj: (T, h, w, C) normalized LF input sequence.
      unroll: lax.scan unroll factor for the time loop (perf knob;
        >1 trades compile time + code size for fewer loop-boundary
        stalls; measured on-chip in docs/PERF_NOTES.md).
      mesh: optional jax.sharding.Mesh — shards the ensemble axis of
        the recurrent state (and therefore every member-batched
        intermediate) across ALL mesh devices: zero-communication
        multi-chip UQ sampling (SURVEY.md §2 'Ensemble parallelism').
        n_samples must divide by the device count.

    Returns (by ``collect``):
      "stats":  dict with mean (T,H,W,C), var (T,H,W,C) over members.
      "fields": (T, N, H, W, C) all ensemble member fields.
    """
    if collect == "stats" and n_samples < 2:
        # var over one member is identically zero: every UQ surface
        # downstream (±2σ bands, CRPS, coverage, calibrated variances)
        # would silently report zero uncertainty. The UQ stat helpers
        # (ensemble_crps, ensemble_zscores) raise for N < 2; so does
        # the stats rollout that feeds them. Single-sample generation
        # is still available via collect="fields".
        raise ValueError(
            f"stats-mode rollout needs >= 2 ensemble members (got "
            f"{n_samples}); use collect='fields' for single samples"
        )
    if collect not in ("stats", "fields"):
        raise ValueError(f"collect must be 'stats' or 'fields', got {collect!r}")
    cfg = model.cfg
    hwnc = cfg.flow_layout == "hwnc"
    # Member (ensemble) axis of flow tensors/states: 0 under nhwc,
    # -2 under hwnc (flows/layout.py member_axis).
    m_ax = -2 if hwnc else 0
    if mesh is not None:
        from tpuflow.train.mesh import ensemble_sharding

        member_sharding = ensemble_sharding(
            mesh, member_axis=2 if hwnc else 0
        )

    def rollout(variables, lf_traj, rng, temperature=temperature):
        # temperature is a runtime (traced) argument so sweeps over tau
        # (the paper's temperature study) reuse one compilation.
        from tpuflow.models.tmglow import build_inv_caches, precast_net_params

        states = init_lstm_state(cfg, (n_samples,))
        if mesh is not None:
            states = jax.lax.with_sharding_constraint(states, member_sharding)
        # Scan-invariant precomputation (see module docstring).
        inv_caches = build_inv_caches(cfg, variables)
        feats_traj = model.apply(variables, lf_traj, method=TMGlow.encode_lf)
        # Fourth hoist: net weights pre-cast to the compute dtype OUTSIDE
        # the scan, so the loop prefetches half the weight bytes per
        # step (bit-identical — see precast_net_params). The fused
        # Pallas path consumes biases in f32, so it keeps the original
        # tree (a bf16 round-trip there would perturb the function).
        if not cfg.use_pallas:
            variables = precast_net_params(cfg, variables)

        def step(carry, feats_t):
            states, key = carry
            key, sub = jax.random.split(key)
            states_in = states
            x, states = model.apply(
                variables, feats_t, states, sub, temperature, inv_caches,
                method=TMGlow.sample_from_feats,
            )  # x: internal flow layout ((N,H,W,C) nhwc / (H,W,N,C) hwnc)
            if overflow_redraw:
                # Member-level overflow recovery (SURVEY.md §5 failure
                # detection, at ensemble granularity): a widened
                # (dispersion-fine-tuned) sampler can rarely push a
                # member outside the decoder's validity envelope and
                # overflow it. Rejection-sample: redraw the FAILED
                # members once at 0.6x temperature (same conditioning —
                # the recurrent state never consumes x, so a redraw is
                # exactly a fresh draw from the same conditional);
                # zero-fill (= the climatological mean in normalized
                # space) any member that fails twice. The redraw hides
                # behind a scalar lax.cond, so the unfailed fast path
                # pays nothing per step; default OFF — the r3-style
                # models never trigger it (eval.overflow_redraw wires
                # it for evaluation/rollout CLIs).
                key, sub2 = jax.random.split(key)
                fin_axes = tuple(
                    a for a in range(x.ndim) if a != (m_ax % x.ndim)
                )
                finite = jnp.all(jnp.isfinite(x), axis=fin_axes)

                def redraw(operands):
                    x_bad, key2 = operands
                    tau2 = (
                        jnp.asarray(temperature, jnp.float32) * 0.6
                    )
                    x2, _ = model.apply(
                        variables, feats_t, states_in, key2, tau2,
                        inv_caches, method=TMGlow.sample_from_feats,
                    )
                    x2 = jnp.nan_to_num(
                        x2, nan=0.0, posinf=0.0, neginf=0.0
                    )
                    fshape = [1] * x_bad.ndim
                    fshape[m_ax % x_bad.ndim] = x_bad.shape[m_ax]
                    keep = jnp.all(
                        jnp.isfinite(x_bad), axis=fin_axes
                    ).reshape(fshape)
                    return jnp.where(keep, x_bad, x2)

                x = jax.lax.cond(
                    jnp.all(finite),
                    lambda ops: ops[0],
                    redraw,
                    (x, sub2),
                )
            if collect == "fields":
                # Per-step member-major normalization: ONE transpose per
                # step (hwnc) instead of ~2 per bijector.
                out = jnp.moveaxis(x, 2, 0) if hwnc else x
            else:
                # Ensemble stats reduce over the member axis directly —
                # under hwnc mean/var of (H,W,N,C) over N gives the
                # same (H,W,C) per-step fields with NO transpose.
                out = (jnp.mean(x, axis=m_ax), jnp.var(x, axis=m_ax))
            return (states, key), out

        # unroll>1 lets XLA software-pipeline consecutive steps: the
        # ~300 per-iteration HBM->VMEM weight prefetches (see
        # docs/PERF_NOTES.md "async copies") amortize over `unroll`
        # physical steps per loop iteration.
        (_, _), ys = jax.lax.scan(
            step, (states, rng), feats_traj, unroll=unroll)
        if collect == "fields":
            return ys  # (T, N, H, W, C)
        mean, var = ys
        return {"mean": mean, "var": var}

    return rollout


def make_batched_ensemble_rollout(
    model: TMGlow,
    n_samples: int,
    temperature: float = 1.0,
    collect: str = "stats",
    mesh=None,
    overflow_redraw: bool = False,
) -> Callable:
    """Batched serving: rollout(variables, lf_trajs, rngs) for a BATCH
    of LF trajectories at once — vmap over the trajectory axis of the
    single-trajectory scan, so B trajectories x N members ride the same
    compiled step as one big MXU batch (one compile, one dispatch,
    no per-trajectory Python loop).

    Parallelism disposition (SURVEY.md §2): the trajectory axis is the
    "data" mesh axis — with ``mesh``, inputs are sharded over it and
    each chip rolls out its trajectories' full ensembles locally
    (zero-communication data parallelism, the production many-LF-runs
    serving shape). The ensemble-across-chips layout for
    single-trajectory latency remains ``make_ensemble_rollout(mesh=...)``.

    Args:
      lf_trajs: (B, T, h, w, C) normalized LF input sequences.
      rngs: (B,) stacked PRNG keys, one per trajectory.

    Returns stacked single-trajectory outputs: "stats" -> dict of
    mean/var (B, T, H, W, C); "fields" -> (B, T, N, H, W, C).
    """
    single = make_ensemble_rollout(
        model, n_samples, temperature, collect,
        overflow_redraw=overflow_redraw,
    )
    batched = jax.vmap(single, in_axes=(None, 0, 0, None))

    if mesh is None:
        def rollout(variables, lf_trajs, rngs, temperature=temperature):
            return batched(variables, lf_trajs, rngs, temperature)
        return rollout

    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sharding = NamedSharding(mesh, P("data"))

    def rollout(variables, lf_trajs, rngs, temperature=temperature):
        lf_trajs = jax.lax.with_sharding_constraint(lf_trajs, data_sharding)
        rngs = jax.lax.with_sharding_constraint(rngs, data_sharding)
        return batched(variables, lf_trajs, rngs, temperature)

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
