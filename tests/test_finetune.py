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


@pytest.mark.slow  # 20s+ on the 1-core bench host
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
    from tpuflow.train.finetune import converged_log_spectra

    step = jax.jit(
        make_finetune_trajectory_step(model, opt, window=2, n_members=M)
    )
    spec_t = jnp.stack([converged_log_spectra(hf[i]) for i in range(B)])
    (p1, lt1), opt_state, metrics = step(
        opt_params, buffers, opt_state, lf, hf, spec_t,
        jax.random.PRNGKey(5), jnp.float32(0.5), jnp.float32(0.05),
        jnp.float32(0.3),
    )
    for k in ("loss", "bpd", "crps", "spec", "disp"):
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


@pytest.mark.slow  # 20s+ on the 1-core bench host
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
    from tpuflow.train.finetune import converged_log_spectra

    step = jax.jit(
        make_finetune_trajectory_step(model, opt, window=2, n_members=M)
    )
    spec_t = jnp.stack([converged_log_spectra(hf[i]) for i in range(B)])
    (_, lt1), _, _ = step(
        opt_params, variables["buffers"], opt.init(opt_params), lf, hf,
        spec_t, jax.random.PRNGKey(8), jnp.float32(0.5), jnp.float32(0.0),
        jnp.float32(0.0),
    )
    np.testing.assert_array_equal(np.asarray(lt1), np.asarray(log_tau))


def test_spectral_target_mse_discriminates():
    """The converged-target penalty flags BOTH wrong spectral shape
    (broadband noise on a low-k reference) and wrong dispersion level
    (under-dispersed members) — the two failure modes the r4 window-
    relative penalties each missed."""
    from tpuflow.train.finetune import (
        converged_log_spectra,
        spectral_target_mse,
    )

    key = jax.random.PRNGKey(9)
    h, w = 16, 32
    ys, xs = jnp.meshgrid(
        jnp.linspace(0, 1, h), jnp.linspace(0, 1, w), indexing="ij"
    )
    # Converged reference: low-k structure moving over many frames.
    phases = jnp.linspace(0, 6.0, 24)
    ref = jnp.stack([
        jnp.sin(2 * jnp.pi * (xs + p)) for p in phases
    ])[:, :, :, None] * jnp.ones((1, 1, 1, 3))  # (T, H, W, C)
    target = converged_log_spectra(ref)[None]  # (1, nbins-1)

    # Members with the same low-k moving structure at the right level.
    win_phases = phases[:4]
    frames = jnp.stack([
        jnp.sin(2 * jnp.pi * (xs + p)) for p in win_phases
    ])[:, None, :, :, None]
    t = jnp.broadcast_to(frames, (4, 1, h, w, 3))
    good = t[:, :, None] + 0.02 * jax.random.normal(key, (4, 1, 3, h, w, 3))
    noisy = t[:, :, None] + 0.5 * jax.random.normal(key, (4, 1, 3, h, w, 3))
    under = 0.1 * good  # right shape, 10x under-dispersed

    # Spread-skill term: correct spread scores lower than 5x-inflated
    # or 5x-deflated ensembles around the same mean.
    from tpuflow.train.finetune import dispersion_log_mse

    hf_tm = t + 0.02 * jax.random.normal(key, (4, 1, h, w, 3))
    d_good = float(dispersion_log_mse(good, hf_tm))
    d_wide = float(dispersion_log_mse(
        good.mean(2, keepdims=True) + 5 * (good - good.mean(2, keepdims=True)),
        hf_tm,
    ))
    d_tight = float(dispersion_log_mse(
        good.mean(2, keepdims=True) + 0.2 * (good - good.mean(2, keepdims=True)),
        hf_tm,
    ))
    assert d_good < d_wide and d_good < d_tight, (d_good, d_wide, d_tight)

    e_good = float(spectral_target_mse(good, target))
    e_noisy = float(spectral_target_mse(noisy, target))
    e_under = float(spectral_target_mse(under, target))
    assert e_noisy > e_good * 3, (e_good, e_noisy)
    assert e_under > e_good * 1.5, (e_good, e_under)


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


@pytest.mark.slow  # 20s+ on the 1-core bench host
def test_finetune_prior_scope_freezes_decoder():
    """train_scope='priors': only the conditional-prior nets (and
    log_tau) move; couplings/encoder/LSTM/actnorm/inv1x1 stay frozen
    (the structurally safe dispersion fine-tune)."""
    from tpuflow.train.finetune import (
        _scope_mask,
        converged_log_spectra,
        make_finetune_optimizer,
        make_finetune_trajectory_step,
    )

    model = TMGlow(MC)
    lf, hf = _data(jax.random.PRNGKey(10))
    state = init_lstm_state(MC, (B,))
    variables = model.init(jax.random.PRNGKey(11), hf[:, 0], lf[:, 0], state)
    params = variables["params"]
    mask = _scope_mask(params, "priors")
    flat_mask = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    assert any(v for v in flat_mask.values())
    assert not all(v for v in flat_mask.values())
    for path, v in flat_mask.items():
        assert v == ("prior" in path), path

    log_tau = jnp.log(jnp.full((MC.n_scales,), 0.8, jnp.float32))
    opt = make_finetune_optimizer(
        1e-2, 100.0, learn_tau=True, scope_mask=mask
    )
    opt_params = (params, log_tau)
    step = jax.jit(
        make_finetune_trajectory_step(model, opt, window=2, n_members=M)
    )
    spec_t = jnp.stack([converged_log_spectra(hf[i]) for i in range(B)])
    (p1, lt1), _, _ = step(
        opt_params, variables["buffers"], opt.init(opt_params), lf, hf,
        spec_t, jax.random.PRNGKey(12), jnp.float32(0.5),
        jnp.float32(0.05), jnp.float32(0.5),
    )
    flat0 = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    flat1 = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(p1)[0]
    }
    moved_any_prior = False
    for path in flat0:
        if "prior" in path:
            moved_any_prior = moved_any_prior or not np.allclose(
                np.asarray(flat0[path]), np.asarray(flat1[path])
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(flat0[path]), np.asarray(flat1[path]),
                err_msg=path,
            )
    assert moved_any_prior
    assert not np.allclose(np.asarray(lt1), np.asarray(log_tau))


# ---------------------------------------------------------------------------
# Driver-level overflow guard (tools/finetune.py; measured necessity in
# r5: fine-tuning the 800-epoch checkpoint ran 6 healthy epochs then
# collapsed bpd -9.6 -> -2.4 in one epoch — the guard rolls the saved
# checkpoint back to the last healthy snapshot and stops early).

def _tiny_args(tmp_path, *extra):
    return [
        "backward-step",
        "model.n_scales=2", "model.n_flow_steps=2", "model.coupling_width=8",
        "model.coupling_layers=2", "model.growth_rate=4",
        "model.encoder_width=8", "model.lstm_hidden=8",
        "model.cond_channels=8", "model.hf_shape=16,32", "model.lf_shape=4,8",
        "model.compute_dtype=float32",
        "data.n_train_traj=4", "data.n_test_traj=2", "data.train_steps=8",
        "data.window=4", "data.batch_size=2",
        f"train.checkpoint_dir={tmp_path}/ckpt",
        "train.epochs=1", "train.checkpoint_every=1", "train.log_every=1000",
        *extra,
    ]


def _read_meta(ckpt_root):
    import json as _json
    import pathlib as _pathlib

    d = _pathlib.Path(ckpt_root)
    step = max(int(p.name) for p in d.iterdir() if p.name.isdigit())
    return _json.loads((d / str(step) / "meta" / "metadata").read_text())


@pytest.mark.slow
def test_finetune_driver_guard_and_rollback(tmp_path):
    from tpuflow.cli.train import main as train_main
    from tpuflow.tools.finetune import main as finetune_main

    train_main(_tiny_args(tmp_path))

    # Healthy run: every epoch under the skip budget -> the FINAL
    # epoch is saved, no early stop.
    finetune_main(_tiny_args(
        tmp_path,
        f"finetune.checkpoint_dir={tmp_path}/ft_ok",
        "finetune.epochs=2", "finetune.n_members=2",
        "finetune.lambda_disp=0.5", "finetune.lr=1e-5",
        "finetune.train_scope=nets",
    ))
    meta = _read_meta(tmp_path / "ft_ok" / "backward-step")
    assert meta["finetune"]["saved_epoch"] == 1
    assert meta["finetune"]["early_stopped"] is False
    assert meta["finetune"]["epochs_run"] == 2

    # Impossible skip budget: every epoch is UNHEALTHY -> two bad
    # epochs trigger the early stop; with no healthy snapshot the
    # final state is saved (with the loud warning) and the meta says
    # what happened.
    finetune_main(_tiny_args(
        tmp_path,
        f"finetune.checkpoint_dir={tmp_path}/ft_stop",
        "finetune.epochs=6", "finetune.n_members=2",
        "finetune.lambda_disp=0.5", "finetune.lr=1e-5",
        "finetune.train_scope=nets",
        "finetune.max_skipped_frac=-1.0",
    ))
    meta2 = _read_meta(tmp_path / "ft_stop" / "backward-step")
    assert meta2["finetune"]["early_stopped"] is True
    assert meta2["finetune"]["epochs_run"] == 2
