"""Sample-path fine-tuning: dispersion + spectral shape in the loop.

VERDICT r3 items 1-2: the converged NLL-trained models (a) park their
sampling variance in the coarsest (base-prior) latent, which the
reverse stack scatters into broadband high-wavenumber noise (the
cylinder spectrum loss — measured by tools/probe_spectrum.py), and
(b) are ~2x underdispersed raw, needing post-hoc spread inflation.
Both are SAMPLE-PATH properties the NLL objective never sees: the
forward (teacher-forced) direction scores density, not the statistics
of generated ensembles.

This module fine-tunes a converged checkpoint on a composite
objective evaluated on actual generative draws every window:

    loss = mean bpd                          (NLL anchor — keeps density)
         + lambda_crps * fair ensemble CRPS  (dispersion in the loop)
         + lambda_spec * log-spectrum MSE    (member fluctuation spectra
                                              match the CONVERGED
                                              reference targets)
         + lambda_disp * spread-skill MSE    (ensemble variance matches
                                              squared ensemble-mean
                                              error pointwise)

plus optionally a LEARNED per-scale sampling temperature (log_tau,
optimized jointly with the parameters) so the model can reallocate
ensemble variance across scales instead of riding a single global tau.
The fitted tau deploys through checkpoint meta ``learned_tau`` (see
eval/loading.resolve_temperature).

The sampling branch shares the teacher's conditioning exactly (the
ConvLSTM state never consumes hf or samples — models/tmglow.py
``nll_and_sample_step``), so members cost one extra ``glow.reverse``
with the member axis folded into the batch.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from tpuflow.eval.stats import energy_spectrum, ensemble_crps
from tpuflow.models.tmglow import TMGlow

# Hard ceiling for the learned temperature: tau >= ~1.15 puts the BULK
# of the latent distribution outside the coupling nets' domain and
# rollouts diverge regardless of clipping (docs/PAPER_PARITY.md
# "Sampling stability"); the optimizer must not be able to walk there.
_TAU_MAX = 1.1


_SPEC_EPS = 1e-14


def member_log_spectra(members: jnp.ndarray) -> jnp.ndarray:
    """Per-trajectory log radial spectra of member fluctuations.

    members: (W, B, M, H, Wd, C) sampled fields (normalized space).
    Velocity channels only; fluctuations remove the (window x member)
    mean per trajectory; index-space bins with the Hann taper (the
    eval metric's non-periodic treatment). Returns (B, nbins-1).
    """
    w, b, m = members.shape[:3]
    mem = jnp.moveaxis(members, 1, 0)  # (B, W, M, ...)
    mem = mem.reshape(b, w * m, *members.shape[3:])[..., :2]
    mem_fluct = mem - mem.mean(axis=1, keepdims=True)

    def spec(f):
        return energy_spectrum(f, None, taper=True)[1]

    e_m = jax.vmap(spec)(mem_fluct)[:, 1:]
    return jnp.log(e_m + _SPEC_EPS)


def converged_log_spectra(hf_ref: jnp.ndarray) -> jnp.ndarray:
    """Log radial spectrum target from a CONVERGED reference
    trajectory (T, H, W, C) in normalized space -> (nbins-1,)."""
    fl = hf_ref[..., :2] - hf_ref[..., :2].mean(0, keepdims=True)
    e = energy_spectrum(fl, None, taper=True)[1][1:]
    return jnp.log(e + _SPEC_EPS)


def spectral_target_mse(
    members: jnp.ndarray, log_targets: jnp.ndarray
) -> jnp.ndarray:
    """MSE between member-fluctuation log spectra and PRECOMPUTED
    converged-reference log-spectrum targets (B, nbins-1).

    Why targets, not the window's own HF (both r4 failures measured):
    (a) LEVEL-matching the 8-step window's HF spectra forces total
    ensemble dispersion down to the window's temporal-variance level —
    spectrum won (0.200 vs bicubic 0.250) but coverage collapsed to
    0.07@0.50 (runs/r4_cylinder/eval64_levelmatch); (b) SHAPE-only
    matching leaves the level direction unanchored and the optimizer
    inflates low-k energy without bound (gnorm 3008, all windows
    overflowing by epoch 10). The converged target anchors both: it IS
    the quantity the eval scores (pooled time x ensemble fluctuation
    energy vs the converged temporal reference), so matching it drives
    the sampled ensemble toward the right energy at every wavenumber —
    including the ~2x raw underdispersion the post-hoc calibration
    used to paper over.
    """
    d = member_log_spectra(members) - log_targets
    return jnp.mean(d * d)


def dispersion_log_mse(
    members: jnp.ndarray, hf_tm: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """Spread-skill (variance-matching) loss: per-pixel log-MSE between
    the fair ensemble variance and the squared ensemble-mean error,
    window-aggregated.

    A calibrated ensemble satisfies E[(x_bar - y)^2] = (1 + 1/M) *
    E[var_ens] pointwise. This is the ONE dispersion signal the window
    temporal variation cannot fake (measured, r4: with pooled-spectrum
    or CRPS objectives the optimizer kept collapsing tau — the 8-step
    window's temporal wake motion already carries the pooled
    fluctuation energy, so ensemble spread was redundant to those
    losses; coverage collapsed to ~0.08@0.50 twice,
    runs/r4_cylinder/eval64_levelmatch + eval64_ft4).

    members: (W, B, M, H, Wd, C); hf_tm: (W, B, H, Wd, C).
    """
    m = members.shape[2]
    mu = members.mean(axis=2)
    err2 = ((mu - hf_tm) ** 2).mean(axis=0)          # (B, H, Wd, C)
    var = members.var(axis=2).mean(axis=0) * (1.0 + 1.0 / m)
    d = jnp.log(var + eps) - jnp.log(err2 + eps)
    return jnp.mean(d * d)


def clipped_tau(log_tau: jax.Array) -> jax.Array:
    """exp(log_tau) bounded to (0, _TAU_MAX] (stability ceiling)."""
    return jnp.minimum(jnp.exp(log_tau), _TAU_MAX)


def make_finetune_loss(
    model: TMGlow,
    n_members: int,
    remat: bool = False,
) -> Callable:
    """Build loss((params, log_tau), buffers, lf_win, hf_win,
    spec_target, state, rng, lambda_crps, lambda_spec) ->
    (total, aux dict). Windows are batch-major (B, W, ...). The lambda
    weights are RUNTIME (traced) scalars so a weight sweep reuses one
    compilation."""

    def step(params, buffers, state, rng_t, lf_t, hf_t, tau):
        bpd, members, state = model.apply(
            {"params": params, "buffers": buffers},
            hf_t, lf_t, state, rng_t, tau, n_members,
            method=TMGlow.nll_and_sample_step,
        )
        return state, (jnp.mean(bpd), members)

    if remat:
        step = jax.checkpoint(step)

    def loss_fn(opt_params, buffers, lf_win, hf_win, spec_target, state,
                rng, lambda_crps, lambda_spec, lambda_disp):
        params, log_tau = opt_params
        tau = clipped_tau(log_tau)
        lf_tm = jnp.moveaxis(lf_win, 1, 0)  # (W, B, ...)
        hf_tm = jnp.moveaxis(hf_win, 1, 0)
        rngs = jax.random.split(rng, lf_tm.shape[0])

        def body(carry, xt):
            rng_t, lf_t, hf_t = xt
            new_state, out = step(
                params, buffers, carry, rng_t, lf_t, hf_t, tau
            )
            return new_state, out

        state, (bpds, members) = jax.lax.scan(
            body, state, (rngs, lf_tm, hf_tm)
        )
        # members: (W, B, M, H, Wd, C); normalized space throughout.
        bpd = jnp.mean(bpds)
        crps = jnp.mean(
            ensemble_crps(members, jnp.moveaxis(hf_win, 1, 0), axis=2)
        )
        spec = spectral_target_mse(members, spec_target)
        disp = dispersion_log_mse(members, hf_tm)
        # Always-on stability barrier: normalized fields live at
        # |x| <~ 5; penalizing excursions beyond 8 sigma keeps the
        # widened sampler INSIDE the decoder's validity envelope
        # (measured r4: a dispersion fine-tune that meets the coverage
        # target at its learned tau overflowed 3/4 trajectories at the
        # 64-step 64-member horizon — the barrier is zero
        # in-distribution and steers the widening away from the
        # overflow boundary instead of discovering it at deploy time).
        bound = jnp.mean(jax.nn.relu(jnp.abs(members) - 8.0) ** 2)
        total = (bpd + lambda_crps * crps + lambda_spec * spec
                 + lambda_disp * disp + bound)
        aux = {"bpd": bpd, "crps": crps, "spec": spec, "disp": disp,
               "bound": bound, "state": state}
        return total, aux

    return loss_fn


def make_finetune_trajectory_step(
    model: TMGlow,
    optimizer: optax.GradientTransformation,
    window: int,
    n_members: int,
    remat: bool = False,
) -> Callable:
    """Whole-trajectory fine-tune step (mirrors
    train/step.make_trajectory_train_step: outer scan over BPTT
    windows inside one jit, state VALUE carried, no gradient across
    window boundaries):

    ((params, log_tau), buffers, opt_state, lf_traj, hf_traj,
     spec_target, rng, lambda_crps, lambda_spec, lambda_disp)
      -> ((params, log_tau), opt_state, metrics)

    ``spec_target``: (B, nbins-1) converged-reference log-spectrum
    targets for the batch trajectories (see spectral_target_mse).

    The lambda weights are runtime scalars (one compile per
    model/shape, swept freely).
    """
    loss_fn = make_finetune_loss(model, n_members, remat=remat)

    def trajectory_step(opt_params, buffers, opt_state, lf_traj, hf_traj,
                        spec_target, rng, lambda_crps, lambda_spec,
                        lambda_disp):
        b, t = lf_traj.shape[:2]
        n_win = t // window
        if n_win == 0:
            raise ValueError(
                f"window={window} exceeds trajectory length {t}"
            )

        def to_windows(x):
            x = x[:, : n_win * window]
            x = x.reshape(b, n_win, window, *x.shape[2:])
            return jnp.moveaxis(x, 1, 0)

        lf_w, hf_w = to_windows(lf_traj), to_windows(hf_traj)
        from tpuflow.models.tmglow import init_lstm_state

        state0 = init_lstm_state(model.cfg, (b,))
        rngs = jax.random.split(rng, n_win)

        def window_body(carry, xs):
            opt_params, opt_state, state = carry
            rng_w, lf_win, hf_win = xs
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(opt_params, buffers, lf_win, hf_win, spec_target, state,
              rng_w, lambda_crps, lambda_spec, lambda_disp)
            # Finite-update guard: the sampling branch can overflow a
            # window (reverse-path amplification once params move off
            # the converged manifold); one NaN gradient would poison
            # the whole parameter tree permanently. Skip the update
            # (params AND opt state unchanged) instead — the next
            # window's draw re-rolls the dice.
            gnorm = optax.global_norm(grads)
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            updates, new_opt_state = optimizer.update(
                jax.tree_util.tree_map(
                    lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
                ),
                opt_state, opt_params,
            )
            new_params = optax.apply_updates(opt_params, updates)
            opt_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                new_params, opt_params,
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old)
                if isinstance(new, jax.Array) else new,
                new_opt_state, opt_state,
            )
            return (opt_params, opt_state, aux["state"]), (
                loss, aux["bpd"], aux["crps"], aux["spec"], aux["disp"],
                aux["bound"], gnorm, 1.0 - ok.astype(jnp.float32),
            )

        (opt_params, opt_state, _), (
            losses, bpds, crpss, specs, disps, bounds, gnorms, skipped
        ) = jax.lax.scan(
            window_body, (opt_params, opt_state, state0),
            (rngs, lf_w, hf_w),
        )
        # Means over FINITE windows only (a skipped window's NaN loss
        # must not poison the epoch telemetry).
        fin = 1.0 - skipped
        n_fin = jnp.maximum(fin.sum(), 1.0)

        def fmean(x):
            return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0) * fin) / n_fin

        metrics = {
            "loss": fmean(losses),
            "bpd": fmean(bpds),
            "crps": fmean(crpss),
            "spec": fmean(specs),
            "disp": fmean(disps),
            "bound": fmean(bounds),
            "grad_norm": fmean(gnorms),
            "skipped_windows": skipped.sum(),
            "tau": clipped_tau(opt_params[1]),
        }
        return opt_params, opt_state, metrics

    return trajectory_step


def _scope_mask(params, scope: str):
    """Boolean pytree: which parameters the fine-tune may move.

    "all": every parameter. "priors": ONLY the conditional-prior nets
    (split*/prior and base_prior) — the dispersion-owning parameters.
    Freezing the couplings/encoder/LSTM keeps the decode map (and
    therefore the mean-field accuracy and density) fixed while the
    priors reallocate/rescale the latent variance: the structurally
    safe dispersion fine-tune (the full-scope composite objective
    destabilized bpd in three measured r4 attempts).
    """
    if scope == "all":
        return jax.tree_util.tree_map(lambda _: True, params)
    if scope == "nets":
        # Everything EXCEPT the flow-arithmetic parameters (actnorm
        # scale/bias, inv-1x1 LU factors): those are log-scale-like and
        # EXPONENTIALLY sensitive — a spike-driven Adam step of ~1e-2
        # on hundreds of log-scales compounds multiplicatively through
        # L*K flow steps, the suspected mechanism behind the abrupt
        # full-scope bpd collapses (r4, three runs). NLL training keeps
        # them healthy; the sample-path objectives don't need them.
        def mark_nets(path, _leaf):
            keys = [str(getattr(k, "key", "")) for k in path]
            return not any(k in ("actnorm", "invconv") for k in keys)

        return jax.tree_util.tree_map_with_path(mark_nets, params)
    if scope != "priors":
        raise ValueError(
            f"train_scope must be 'all', 'nets' or 'priors', got {scope!r}"
        )

    def mark(path, _leaf):
        keys = [str(getattr(k, "key", "")) for k in path]
        return any("prior" in k for k in keys)

    return jax.tree_util.tree_map_with_path(mark, params)


def make_finetune_optimizer(
    lr: float, grad_clip: float, learn_tau: bool,
    tau_lr_scale: float = 10.0, scope_mask=None,
) -> optax.GradientTransformation:
    """Adam over the (params, log_tau) tuple. log_tau gets lr *
    tau_lr_scale (a 3-vector fit against field-sized gradients needs a
    faster clock than the net weights); with ``learn_tau=False`` its
    updates are zeroed so tau stays at initialization. ``scope_mask``
    (a boolean pytree over params, see _scope_mask) freezes everything
    outside the fine-tune scope.
    """
    def tau_mask(factor: float):
        def mask(tree):
            params, _log_tau = tree
            return (jax.tree_util.tree_map(lambda _: False, params), True)

        return optax.masked(optax.scale(factor), mask)

    chain = [
        optax.clip_by_global_norm(grad_clip),
        optax.adam(lr),
    ]
    if scope_mask is not None:
        # Zero updates OUTSIDE the scope: masked(scale(0), outside).
        inverted = jax.tree_util.tree_map(lambda b: not b, scope_mask)
        chain.append(
            optax.masked(optax.scale(0.0), lambda tree: (inverted, False))
        )
    if learn_tau:
        chain.append(tau_mask(tau_lr_scale))
    else:
        chain.append(tau_mask(0.0))
    return optax.chain(*chain)
