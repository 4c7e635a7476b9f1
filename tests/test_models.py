"""Model-layer tests: encoder pyramid shapes, ConvLSTM carry,
multi-scale Glow invertibility (<1e-4 BASELINE gate), TM-Glow NLL
finiteness/differentiability and sampling (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.configs.config import ModelConfig
from tpuflow.models import (
    ConvLSTMCell,
    LFEncoder,
    MultiScaleGlow,
    TMGlow,
    init_lstm_state,
)

CFG = ModelConfig(
    n_scales=2,
    n_flow_steps=2,
    channels=3,
    hf_shape=(16, 16),
    lf_shape=(4, 4),
    coupling_width=8,
    coupling_layers=2,
    growth_rate=4,
    encoder_width=8,
    lstm_hidden=8,
    cond_channels=8,
    compute_dtype="float32",
    use_pallas=False,
)
B = 2


def _hf(key):
    return jax.random.normal(key, (B, *CFG.hf_shape, CFG.channels), jnp.float32)


def _lf(key):
    return jax.random.normal(key, (B, *CFG.lf_shape, CFG.channels), jnp.float32)


def test_lf_encoder_pyramid_shapes():
    m = LFEncoder(scale_shapes=((8, 8), (4, 4)), width=8, dtype=jnp.float32)
    lf = _lf(jax.random.PRNGKey(0))
    variables = m.init(jax.random.PRNGKey(1), lf)
    feats = m.apply(variables, lf)
    assert [f.shape for f in feats] == [(B, 8, 8, 8), (B, 4, 4, 8)]


def test_conv_lstm_carry():
    m = ConvLSTMCell(hidden=8, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, 4))
    state = (jnp.zeros((B, 8, 8, 8)), jnp.zeros((B, 8, 8, 8)))
    variables = m.init(jax.random.PRNGKey(1), x, state)
    h1, s1 = m.apply(variables, x, state)
    h2, s2 = m.apply(variables, x, s1)
    assert h1.shape == (B, 8, 8, 8)
    # State actually evolves (the recurrence is live).
    assert not np.allclose(h1, h2)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        assert a.shape == b.shape and a.dtype == jnp.float32


def _perturb_couplings(params, key):
    """Kick every zero-init coupling output conv so transforms are
    nontrivial (at init the whole flow is near-identity)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    leaves = []
    keys = jax.random.split(key, len(flat))
    for k, (path, leaf) in zip(keys, flat):
        names = [str(getattr(p, "key", "")) for p in path]
        if any(
            n.startswith(("conv_out", "joint_")) or n == "prior_conv"
            for n in names
        ):
            if names[-1] == "kernel":
                leaf = leaf + 0.05 * jax.random.normal(k, leaf.shape)
        leaves.append(leaf)
    return jax.tree.unflatten(treedef, leaves)


def test_multiscale_glow_invertibility_gate():
    """reverse(forward(x)) == x to <1e-4 — the BASELINE gate."""
    L, K, C = 3, 2, 4
    m = MultiScaleGlow(
        n_scales=L, n_steps=K, in_channels=C, width=8, layers=2,
        growth_rate=4, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 16, 16, C))
    conds = [
        jax.random.normal(jax.random.PRNGKey(10 + l), (B, 16 >> (l + 1), 16 >> (l + 1), 6))
        for l in range(L)
    ]
    variables = m.init(jax.random.PRNGKey(1), x, conds)
    params = _perturb_couplings(variables["params"], jax.random.PRNGKey(2))
    variables = {**variables, "params": params}

    latents, logdet, logp = m.apply(variables, x, conds, method=MultiScaleGlow.forward)
    # Latent volume preservation: total dims == input dims.
    total = sum(int(np.prod(z.shape[1:])) for z in latents)
    assert total == 16 * 16 * C
    x_rec, logp_rec = m.apply(
        variables, conds, latents=latents, method=MultiScaleGlow.reverse
    )
    np.testing.assert_allclose(x_rec, x, atol=1e-4, rtol=0)
    np.testing.assert_allclose(logp, logp_rec, rtol=1e-5)

    # Generation path: prior sampling gives the right output shape.
    x_gen, _ = m.apply(
        variables, conds, rng=jax.random.PRNGKey(3), temperature=0.7,
        method=MultiScaleGlow.reverse,
    )
    assert x_gen.shape == x.shape
    assert np.all(np.isfinite(x_gen))


def test_per_scale_temperature_vector_matches_scalar():
    """An (L,)-vector temperature with equal entries reproduces the
    scalar path bit-for-bit (same rng); zeroing only the fine-scale
    entry changes the sample (the fine split draws are live) while the
    coarse scales' draws still enter."""
    model = TMGlow(CFG)
    hf, lf = _hf(jax.random.PRNGKey(7)), _lf(jax.random.PRNGKey(8))
    state = init_lstm_state(CFG, (B,))
    variables = model.init(jax.random.PRNGKey(9), hf, lf, state)
    variables = {
        **variables,
        "params": _perturb_couplings(variables["params"], jax.random.PRNGKey(11)),
    }
    L = CFG.n_scales
    rng = jax.random.PRNGKey(20)
    x_scalar, _ = model.apply(
        variables, lf, state, rng, 0.7, method=TMGlow.sample_step
    )
    x_vec, _ = model.apply(
        variables, lf, state, rng, jnp.full((L,), 0.7), method=TMGlow.sample_step
    )
    np.testing.assert_array_equal(np.asarray(x_scalar), np.asarray(x_vec))

    tau_fine0 = jnp.asarray([0.0] + [0.7] * (L - 1))
    x_fine0, _ = model.apply(
        variables, lf, state, rng, tau_fine0, method=TMGlow.sample_step
    )
    assert np.all(np.isfinite(x_fine0))
    assert not np.allclose(np.asarray(x_fine0), np.asarray(x_scalar))

    # Wrong-length vector is a hard error, not a silent broadcast.
    with pytest.raises(ValueError, match="per-scale temperature"):
        model.apply(
            variables, lf, state, rng, jnp.full((L + 1,), 0.7),
            method=TMGlow.sample_step,
        )


def test_tmglow_nll_finite_and_differentiable():
    model = TMGlow(CFG)
    hf, lf = _hf(jax.random.PRNGKey(0)), _lf(jax.random.PRNGKey(1))
    state = init_lstm_state(CFG, (B,))
    variables = model.init(jax.random.PRNGKey(2), hf, lf, state)

    bpd, new_state = model.apply(variables, hf, lf, state)
    assert bpd.shape == (B,)
    assert np.all(np.isfinite(bpd))
    # State evolved.
    assert not np.allclose(new_state[0][0], 0.0)

    def loss(params):
        out, _ = model.apply({**variables, "params": params}, hf, lf, state)
        return jnp.mean(out)

    grads = jax.grad(loss)(variables["params"])
    gnorm = jnp.sqrt(
        sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_tmglow_end_to_end_invertibility():
    model = TMGlow(CFG)
    hf, lf = _hf(jax.random.PRNGKey(3)), _lf(jax.random.PRNGKey(4))
    state = init_lstm_state(CFG, (B,))
    variables = model.init(jax.random.PRNGKey(5), hf, lf, state)
    params = _perturb_couplings(variables["params"], jax.random.PRNGKey(6))
    variables = {**variables, "params": params}

    latents, _, _, s1 = model.apply(
        variables, hf, lf, state, method=TMGlow.encode_step
    )
    x_rec, s2 = model.apply(
        variables, latents, lf, state, method=TMGlow.reconstruct_step
    )
    np.testing.assert_allclose(x_rec, hf, atol=1e-4, rtol=0)
    # Conditioning state advanced identically on both paths.
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(a, b)


def test_tmglow_sample_and_recurrence():
    model = TMGlow(CFG)
    hf, lf = _hf(jax.random.PRNGKey(7)), _lf(jax.random.PRNGKey(8))
    state = init_lstm_state(CFG, (B,))
    variables = model.init(jax.random.PRNGKey(9), hf, lf, state)
    # At init every conditioning pathway enters through a zero-init
    # conv (identity flow, N(0,I) priors) so state cannot influence the
    # sample; perturb to make the conditioning live.
    variables = {
        **variables,
        "params": _perturb_couplings(variables["params"], jax.random.PRNGKey(11)),
    }

    x1, s1 = model.apply(
        variables, lf, state, jax.random.PRNGKey(10), 0.7,
        method=TMGlow.sample_step,
    )
    assert x1.shape == hf.shape
    assert np.all(np.isfinite(x1))
    # Same rng, evolved state => different sample (recurrence matters).
    x2, _ = model.apply(
        variables, lf, s1, jax.random.PRNGKey(10), 0.7,
        method=TMGlow.sample_step,
    )
    assert not np.allclose(x1, x2)


import dataclasses

import pytest


@pytest.mark.parametrize(
    "overrides",
    [
        # Single scale (no Split layers at all on the path).
        dict(n_scales=1, hf_shape=(8, 8), lf_shape=(4, 4)),
        # Three scales on a non-square, wide-aspect grid (the
        # production backward-step shape family), K=3.
        dict(n_scales=3, n_flow_steps=3, hf_shape=(16, 32), lf_shape=(4, 8)),
        # Odd widths: growth/width not powers of two.
        dict(coupling_width=10, growth_rate=6, lstm_hidden=6,
             cond_channels=6, encoder_width=6),
    ],
    ids=["one-scale", "three-scale-wide", "odd-widths"],
)
def test_invertibility_across_configs(overrides):
    """The <1e-4 reconstruction gate holds across config space, not
    just the canonical shape — single-scale (no splits), deep wide-
    aspect grids, and non-power-of-two widths."""
    cfg = dataclasses.replace(CFG, **overrides)
    model = TMGlow(cfg)
    hf = jax.random.normal(
        jax.random.PRNGKey(31), (B, *cfg.hf_shape, cfg.channels), jnp.float32
    )
    lf = jax.random.normal(
        jax.random.PRNGKey(32), (B, *cfg.lf_shape, cfg.channels), jnp.float32
    )
    state = init_lstm_state(cfg, (B,))
    variables = model.init(jax.random.PRNGKey(33), hf, lf, state)
    params = _perturb_couplings(variables["params"], jax.random.PRNGKey(34))
    variables = {**variables, "params": params}
    latents, logdet, logp, _ = model.apply(
        variables, hf, lf, state, method=TMGlow.encode_step
    )
    assert np.all(np.isfinite(np.asarray(logdet)))
    assert np.all(np.isfinite(np.asarray(logp)))
    x_rec, _ = model.apply(
        variables, latents, lf, state, method=TMGlow.reconstruct_step
    )
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(hf),
                               atol=1e-4, rtol=0)
