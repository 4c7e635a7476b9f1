"""Sample-path fine-tune tests (train/finetune.py; VERDICT r3 items
1-2): the composite NLL+CRPS+spectral objective steps, per-scale tau
learning, and deployment resolution of the learned temperature."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.configs.config import ModelConfig
from tpuflow.models import TMGlow, init_lstm_state

MC = ModelConfig(
    n_scales=2, n_flow_steps=2, hf_shape=(16, 32), lf_shape=(4, 8),
    coupling_width=8, coupling_layers=2, growth_rate=4, encoder_width=8,
    lstm_hidden=8, cond_channels=8, compute_dtype="float32",
)
B, W, M = 2, 4, 3


def _data(key):
    kl, kh = jax.random.split(key)
    lf = jax.random.normal(kl, (B, W, *MC.lf_shape, MC.channels), jnp.float32)
    hf = jax.random.normal(kh, (B, W, *MC.hf_shape, MC.channels), jnp.float32)
    return lf, hf


def test_nll_and_sample_step_shapes_and_conditioning():
    """The joint step returns teacher bpd + (B, M, H, W, C) members;
    the members share the teacher's conditioning (same state out as
    nll_step)."""
    model = TMGlow(MC)
    lf, hf = _data(jax.random.PRNGKey(0))
    state = init_lstm_state(MC, (B,))
    variables = model.init(jax.random.PRNGKey(1), hf[:, 0], lf[:, 0], state)

    bpd, members, s1 = model.apply(
        variables, hf[:, 0], lf[:, 0], state, jax.random.PRNGKey(2),
        0.8, M, method=TMGlow.nll_and_sample_step,
    )
    assert bpd.shape == (B,)
    assert members.shape == (B, M, *MC.hf_shape, MC.channels)
    assert np.all(np.isfinite(np.asarray(members)))
    bpd2, s2 = model.apply(variables, hf[:, 0], lf[:, 0], state)
    np.testing.assert_allclose(np.asarray(bpd), np.asarray(bpd2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_finetune_trajectory_step_updates_params_and_tau():
    from tpuflow.train.finetune import (
        clipped_tau,
        make_finetune_optimizer,
        make_finetune_trajectory_step,
    )

    model = TMGlow(MC)
    lf, hf = _data(jax.random.PRNGKey(3))
    state = init_lstm_state(MC, (B,))
    variables = model.init(jax.random.PRNGKey(4), hf[:, 0], lf[:, 0], state)
    params, buffers = variables["params"], variables["buffers"]
    log_tau = jnp.log(jnp.full((MC.n_scales,), 0.8, jnp.float32))
    opt = make_finetune_optimizer(1e-3, 100.0, learn_tau=True)
    opt_params = (params, log_tau)
    opt_state = opt.init(opt_params)
    step = jax.jit(
        make_finetune_trajectory_step(model, opt, window=2, n_members=M)
    )
    (p1, lt1), opt_state, metrics = step(
        opt_params, buffers, opt_state, lf, hf, jax.random.PRNGKey(5),
        jnp.float32(0.5), jnp.float32(0.05),
    )
    for k in ("loss", "bpd", "crps", "spec"):
        assert np.isfinite(float(metrics[k])), k
    # Both the parameters and the per-scale temperature moved.
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p1))
    )
    assert moved
    assert not np.allclose(np.asarray(lt1), np.asarray(log_tau))
    assert np.asarray(metrics["tau"]).shape == (MC.n_scales,)
    # Stability ceiling: clipped_tau never exceeds 1.1.
    assert float(jnp.max(clipped_tau(jnp.log(jnp.asarray([5.0]))))) <= 1.1 + 1e-6


def test_finetune_optimizer_freezes_tau_when_disabled():
    from tpuflow.train.finetune import (
        make_finetune_optimizer,
        make_finetune_trajectory_step,
    )

    model = TMGlow(MC)
    lf, hf = _data(jax.random.PRNGKey(6))
    state = init_lstm_state(MC, (B,))
    variables = model.init(jax.random.PRNGKey(7), hf[:, 0], lf[:, 0], state)
    log_tau = jnp.log(jnp.full((MC.n_scales,), 0.7, jnp.float32))
    opt = make_finetune_optimizer(1e-3, 100.0, learn_tau=False)
    opt_params = (variables["params"], log_tau)
    step = jax.jit(
        make_finetune_trajectory_step(model, opt, window=2, n_members=M)
    )
    (_, lt1), _, _ = step(
        opt_params, variables["buffers"], opt.init(opt_params), lf, hf,
        jax.random.PRNGKey(8), jnp.float32(0.5), jnp.float32(0.0),
    )
    np.testing.assert_array_equal(np.asarray(lt1), np.asarray(log_tau))


def test_spectral_log_mse_discriminates_noise():
    """SHAPE matching (default): a member ensemble whose fluctuation
    rides the same low-wavenumber moving structure as the reference
    scores low; broadband white noise (flat spectrum — hallucinated
    small scales) scores high REGARDLESS of its level, and the penalty
    is level-invariant (2x-scaled members score the same). Level
    matching (normalize=False) additionally sees the amplitude."""
    from tpuflow.train.finetune import spectral_log_mse

    key = jax.random.PRNGKey(9)
    h, w = 16, 32
    ys, xs = jnp.meshgrid(
        jnp.linspace(0, 1, h), jnp.linspace(0, 1, w), indexing="ij"
    )
    # Low-k structure that MOVES across the window -> the reference
    # fluctuation (time-mean removed) is low-k peaked.
    phases = jnp.linspace(0, 1.5, 4)
    frames = jnp.stack([
        jnp.sin(2 * jnp.pi * (xs + p)) for p in phases
    ])[:, None, :, :, None]  # (W, 1, H, Wd, 1)
    t = jnp.broadcast_to(frames, (4, 2, h, w, 3))  # (W, B, H, Wd, C)
    hf = jnp.moveaxis(t, 0, 1) + 0.01 * jax.random.normal(
        key, (2, 4, h, w, 3)
    )
    members_clean = (
        t[:, :, None] + 0.02 * jax.random.normal(key, (4, 2, 3, h, w, 3))
    )
    members_noisy = (
        t[:, :, None] + 0.5 * jax.random.normal(key, (4, 2, 3, h, w, 3))
    )
    clean = float(spectral_log_mse(members_clean, hf))
    noisy = float(spectral_log_mse(members_noisy, hf))
    assert noisy > clean * 3, (clean, noisy)
    # Shape penalty is level-invariant: scaling members 2x changes
    # nothing (the r4 lesson — level matching collapsed dispersion).
    scaled = float(spectral_log_mse(2.0 * members_noisy, hf))
    np.testing.assert_allclose(scaled, noisy, rtol=1e-4)
    # Level matching sees the amplitude difference.
    lvl = float(spectral_log_mse(members_noisy, hf, normalize=False))
    lvl2 = float(spectral_log_mse(2.0 * members_noisy, hf, normalize=False))
    assert lvl2 > lvl * 1.05, (lvl, lvl2)


def test_resolve_temperature_priority():
    from tpuflow.configs.config import load_case
    from tpuflow.eval.loading import resolve_temperature

    cfg = load_case("backward-step")
    # Scalar fallback.
    assert resolve_temperature(cfg, {}) == cfg.eval.temperature
    # learned_tau from checkpoint meta.
    t = resolve_temperature(cfg, {"learned_tau": [0.9, 0.8, 0.2]})
    np.testing.assert_allclose(np.asarray(t), [0.9, 0.8, 0.2])
    # Explicit override beats learned_tau.
    cfg2 = load_case(
        "backward-step", {"eval.temperature_scales": "0.5,0.5,0.1"}
    )
    t2 = resolve_temperature(cfg2, {"learned_tau": [0.9, 0.8, 0.2]})
    np.testing.assert_allclose(np.asarray(t2), [0.5, 0.5, 0.1])
    # Wrong lengths are hard errors.
    with pytest.raises(ValueError, match="learned_tau"):
        resolve_temperature(cfg, {"learned_tau": [0.9]})
    with pytest.raises(ValueError, match="temperature_scales"):
        resolve_temperature(
            load_case("backward-step", {"eval.temperature_scales": "1,2"}),
            {},
        )


def test_fixture_v3_cascade():
    """v3: LF stream bit-identical to v2; HF gains decades of high-k
    fluctuation energy with ~k^-3 slope in the cascade band."""
    from tpuflow.data.synthetic import generate_case
    from tpuflow.eval.stats import energy_spectrum

    lf2, hf2 = generate_case(
        "backward-step", 1, 16, (32, 64), (8, 16), seed=3, fixture_version=2
    )
    lf3, hf3 = generate_case(
        "backward-step", 1, 16, (32, 64), (8, 16), seed=3, fixture_version=3
    )
    np.testing.assert_array_equal(lf2, lf3)
    assert not np.allclose(hf2, hf3)

    def hi_band(hf):
        fl = hf[0, ..., :2] - hf[0, ..., :2].mean(0, keepdims=True)
        k, e = energy_spectrum(jnp.asarray(fl), (1.0, 4.0), taper=True)
        n = len(np.asarray(k))
        return float(np.asarray(e)[int(0.6 * n):].mean())

    ratio = np.log10(hi_band(hf3) / (hi_band(hf2) + 1e-30))
    assert ratio > 1.0, ratio
    # Solid-step mask still holds on the cascade-injected fields.
    from tpuflow.data.synthetic import _bstep_mask

    assert np.all(hf3[0][:, _bstep_mask((32, 64)), :2] == 0.0)
