"""Pallas kernel tests (interpret mode on CPU): the fused coupling
kernel must match the XLA reference path to ~1e-6 in both directions,
roundtrip exactly, and produce the same gradients (SURVEY.md §7 hard
part 4: 'matching XLA reference to ~1e-6')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpuflow.kernels.coupling_pallas as cpk
from tpuflow.kernels.coupling_ops import _xla_coupling_apply
from tpuflow.kernels.coupling_pallas import pallas_coupling_apply


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = cpk.INTERPRET
    cpk.INTERPRET = True
    yield
    cpk.INTERPRET = old


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


# Odd spatial/channel sizes exercise the padding/masking path.
SHAPES = [(2, 4, 4, 4), (3, 5, 7, 3), (2, 2, 8, 16, 2)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("reverse", [False, True])
def test_matches_xla(shape, reverse):
    x, raw, t = _rand(0, shape), 0.5 * _rand(1, shape), _rand(2, shape)
    y_ref, ld_ref = _xla_coupling_apply(x, raw, t, reverse=reverse)
    y, ld = pallas_coupling_apply(x, raw, t, reverse=reverse)
    np.testing.assert_allclose(y, y_ref, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(ld, ld_ref, atol=1e-5, rtol=1e-6)


def test_roundtrip():
    shape = (2, 4, 6, 4)
    x, raw, t = _rand(3, shape), 0.5 * _rand(4, shape), _rand(5, shape)
    y, ld_f = pallas_coupling_apply(x, raw, t, reverse=False)
    x_rec, ld_r = pallas_coupling_apply(y, raw, t, reverse=True)
    np.testing.assert_allclose(x_rec, x, atol=1e-5, rtol=0)
    np.testing.assert_allclose(ld_f, -ld_r, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_gradients_match_xla(reverse):
    shape = (2, 4, 4, 2)
    x, raw, t = _rand(6, shape), 0.5 * _rand(7, shape), _rand(8, shape)

    def loss(fn, x, raw, t):
        y, ld = fn(x, raw, t, reverse=reverse)
        return jnp.sum(y**2) + 0.5 * jnp.sum(ld**2)

    g_ref = jax.grad(lambda *a: loss(_xla_coupling_apply, *a), argnums=(0, 1, 2))(
        x, raw, t
    )
    g = jax.grad(lambda *a: loss(pallas_coupling_apply, *a), argnums=(0, 1, 2))(
        x, raw, t
    )
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_model_with_pallas_coupling_matches_xla_model():
    """Whole-model equivalence: use_pallas=True (interpret) vs False."""
    from tpuflow.configs.config import ModelConfig
    from tpuflow.data import generate_case
    from tpuflow.models import TMGlow, init_lstm_state
    import tpuflow.kernels.coupling_ops as ops

    # The dispatcher gates on default_backend()=="tpu"; bypass by
    # patching the probe (interpret mode runs anywhere).
    old = ops._on_tpu
    ops._on_tpu = lambda: True
    try:
        mc = dict(
            n_scales=2, n_flow_steps=2, channels=3, hf_shape=(16, 32),
            lf_shape=(4, 8), coupling_width=8, coupling_layers=2,
            growth_rate=4, encoder_width=8, lstm_hidden=8, cond_channels=8,
            compute_dtype="float32",
        )
        lf, hf = generate_case("backward-step", 2, 1, (16, 32), (4, 8), 0)
        hf0, lf0 = jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0])

        m_x = TMGlow(ModelConfig(use_pallas=False, **mc))
        m_p = TMGlow(ModelConfig(use_pallas=True, **mc))
        state = init_lstm_state(m_x.cfg, (2,))
        v = m_x.init(jax.random.PRNGKey(0), hf0, lf0, state)

        bpd_x, _ = m_x.apply(v, hf0, lf0, state)
        bpd_p, _ = m_p.apply(v, hf0, lf0, state)
        np.testing.assert_allclose(bpd_p, bpd_x, atol=1e-6, rtol=1e-6)
    finally:
        ops._on_tpu = old
