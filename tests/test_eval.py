"""Evaluation tests: ensemble rollout (stats + fields modes), held-out
NLL, physics statistics, ensemble sharding over fake devices
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.configs.config import ModelConfig
from tpuflow.data import generate_case
from tpuflow.eval import (
    ensemble_stats,
    make_ensemble_rollout,
    make_nll_eval,
    relative_l2,
    tke_field,
    velocity_moments,
)
from tpuflow.models import TMGlow, init_lstm_state

MC = ModelConfig(
    n_scales=2, n_flow_steps=2, channels=3, hf_shape=(16, 32),
    lf_shape=(4, 8), coupling_width=8, coupling_layers=2, growth_rate=4,
    encoder_width=8, lstm_hidden=8, cond_channels=8,
    compute_dtype="float32", use_pallas=False,
)
T, N = 4, 6


def _variables():
    model = TMGlow(MC)
    lf, hf = generate_case("backward-step", 1, 2, MC.hf_shape, MC.lf_shape, 0)
    state = init_lstm_state(MC, (1,))
    return model, model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]), state
    )


def test_rollout_stats_mode():
    model, variables = _variables()
    lf_traj = jnp.asarray(
        generate_case("backward-step", 1, T, MC.hf_shape, MC.lf_shape, 1)[0][0]
    )
    rollout = jax.jit(make_ensemble_rollout(model, N, temperature=0.8))
    out = rollout(variables, lf_traj, jax.random.PRNGKey(2))
    assert out["mean"].shape == (T, *MC.hf_shape, 3)
    assert out["var"].shape == (T, *MC.hf_shape, 3)
    assert np.all(np.isfinite(out["mean"]))
    assert np.all(out["var"] >= 0)
    # Nonzero spread: members actually differ.
    assert float(out["var"].mean()) > 0


def test_rollout_fields_mode_matches_stats():
    model, variables = _variables()
    lf_traj = jnp.asarray(
        generate_case("backward-step", 1, T, MC.hf_shape, MC.lf_shape, 1)[0][0]
    )
    r_fields = jax.jit(
        make_ensemble_rollout(model, N, temperature=0.8, collect="fields")
    )
    r_stats = jax.jit(make_ensemble_rollout(model, N, temperature=0.8))
    key = jax.random.PRNGKey(3)
    fields = r_fields(variables, lf_traj, key)
    stats = r_stats(variables, lf_traj, key)
    assert fields.shape == (T, N, *MC.hf_shape, 3)
    np.testing.assert_allclose(
        np.mean(fields, axis=1), stats["mean"], atol=1e-5
    )
    np.testing.assert_allclose(np.var(fields, axis=1), stats["var"], atol=1e-5)


def test_nll_eval():
    model, variables = _variables()
    lf, hf = generate_case("backward-step", 2, T, MC.hf_shape, MC.lf_shape, 4)
    nll = jax.jit(make_nll_eval(model))
    bpds = nll(variables, jnp.asarray(lf), jnp.asarray(hf))
    assert bpds.shape == (T, 2)
    assert np.all(np.isfinite(bpds))


def test_physics_stats():
    rng = np.random.default_rng(0)
    fields = rng.normal(size=(N, T, 8, 8, 3)).astype(np.float32)
    es = ensemble_stats(jnp.asarray(fields))
    assert es["mean"].shape == (T, 8, 8, 3)
    k = tke_field(es["var"])
    assert k.shape == (T, 8, 8)
    # TKE of ~N(0,1) fluctuations ≈ 0.5*(1+1) = 1.
    assert 0.7 < float(k.mean()) < 1.3

    m = velocity_moments(jnp.asarray(fields), axes=(0, 1))
    assert m["mean"].shape == (8, 8, 3)
    assert abs(float(m["skew"].mean())) < 0.5
    assert 2.0 < float(m["kurt"].mean()) < 4.0

    err = relative_l2(es["mean"], jnp.zeros_like(es["mean"]) + 1.0)
    assert np.isfinite(float(err))


def test_long_horizon_rollout_stats_mode():
    """BASELINE stretch config #5 in miniature: a 256-step rollout in
    stats mode — O(1) scan memory, finite statistics throughout."""
    model, variables = _variables()
    lf_short = generate_case("backward-step", 1, 32, MC.hf_shape, MC.lf_shape, 9)[0][0]
    lf_traj = jnp.asarray(np.concatenate([lf_short] * 8, axis=0))  # 256 steps
    rollout = jax.jit(make_ensemble_rollout(model, 4, temperature=0.7))
    out = rollout(variables, lf_traj, jax.random.PRNGKey(10))
    assert out["mean"].shape[0] == 256
    assert np.all(np.isfinite(out["mean"]))
    assert np.all(np.isfinite(out["var"]))


def test_rollout_ensemble_sharded():
    """Ensemble members shard across the 8 fake devices with identical
    results to unsharded (zero-communication parallelism)."""
    from tpuflow.train.mesh import make_mesh

    model, variables = _variables()
    lf_traj = jnp.asarray(
        generate_case("backward-step", 1, T, MC.hf_shape, MC.lf_shape, 1)[0][0]
    )
    n = 8
    ref = jax.jit(make_ensemble_rollout(model, n, temperature=0.8))(
        variables, lf_traj, jax.random.PRNGKey(5)
    )
    mesh = make_mesh(data=4, ensemble=2)
    sharded = jax.jit(make_ensemble_rollout(model, n, temperature=0.8, mesh=mesh))
    out = sharded(variables, lf_traj, jax.random.PRNGKey(5))
    np.testing.assert_allclose(ref["mean"], out["mean"], atol=1e-5)
    np.testing.assert_allclose(ref["var"], out["var"], atol=1e-5)
