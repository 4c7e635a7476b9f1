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


# ---------------------------------------------------------------------------
# Fused whole-coupling kernel (kernels/coupling_fused.py): net convs as
# dx-grouped matmuls over lane-concatenated dy-taps (v2 scheme) +
# affine + logdet in one Pallas call. Interpret mode
# on CPU here; the compiled-on-TPU parity is captured by bench.py's
# pallas section (VERDICT r1 item 7).
# ---------------------------------------------------------------------------

import tpuflow.kernels.coupling_fused as cfk
from tpuflow.flows.coupling import AffineCoupling


@pytest.fixture
def _fused_interpret():
    old = cfk.INTERPRET
    cfk.INTERPRET = True
    yield
    cfk.INTERPRET = old


def _coupling_pair(dtype, width=16, layers=3, growth=8):
    kw = dict(width=width, layers=layers, growth_rate=growth, dtype=dtype)
    return (AffineCoupling(use_pallas=False, **kw),
            AffineCoupling(use_pallas=True, **kw))


def _perturbed_init(m, x, cond, seed=3):
    v = m.init(jax.random.PRNGKey(2), x, cond)
    # Perturb the zero-init head so the transform is nontrivial.
    params = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(seed), a.shape),
        v["params"],
    )
    return {"params": params}


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize(
    "shape,cond_batch",
    [
        ((3, 8, 16, 12), 1),    # batch-1 cond broadcast (rollout shape)
        ((3, 8, 16, 12), 3),    # batched cond (training shape)
        ((2, 6, 12, 3), 1),     # odd channels: ca=1, cb=2
        ((2, 2, 8, 16, 4), 2),  # extra leading dims
    ],
)
def test_fused_coupling_matches_xla_path(_fused_interpret, shape, cond_batch, reverse):
    x = _rand(0, shape)
    cond = _rand(1, (cond_batch, *shape[-3:-1], 16)) if cond_batch != 2 \
        else _rand(1, (*shape[:-1], 16))
    m_x, m_p = _coupling_pair(jnp.float32)
    v = _perturbed_init(m_x, x, cond)
    y_x, ld_x = m_x.apply(v, x, cond, reverse=reverse)
    y_p, ld_p = m_p.apply(v, x, cond, reverse=reverse)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_p), np.asarray(ld_x),
                               atol=2e-4, rtol=1e-5)


def test_fused_coupling_roundtrip(_fused_interpret):
    x = _rand(0, (3, 8, 16, 12))
    cond = _rand(1, (1, 8, 16, 16))
    _, m_p = _coupling_pair(jnp.float32)
    v = _perturbed_init(m_p, x, cond)
    y, ld_f = m_p.apply(v, x, cond, reverse=False)
    x_rec, ld_r = m_p.apply(v, y, cond, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(ld_f), np.asarray(-ld_r),
                               atol=1e-5, rtol=1e-6)


@pytest.mark.slow  # 20s+ on the 1-core bench host
def test_fused_coupling_no_cond(_fused_interpret):
    x = _rand(0, (2, 8, 8, 8))
    m_x, m_p = _coupling_pair(jnp.float32)
    v = _perturbed_init(m_x, x, None)
    y_x, ld_x = m_x.apply(v, x)
    y_p, ld_p = m_p.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_p), np.asarray(ld_x),
                               atol=2e-4, rtol=1e-5)


def test_fused_coupling_gradients(_fused_interpret):
    """custom_vjp backward (XLA-reference recompute) matches the XLA
    path's gradients for params, x and cond."""
    x = _rand(0, (3, 8, 16, 12))
    cond = _rand(1, (3, 8, 16, 16))
    m_x, m_p = _coupling_pair(jnp.float32)
    v = _perturbed_init(m_x, x, cond)

    def loss(m, p, x, cond):
        y, ld = m.apply({"params": p}, x, cond)
        return jnp.sum(y**2) + jnp.sum(ld**2)

    g_x = jax.grad(lambda p, a, c: loss(m_x, p, a, c), argnums=(0, 1, 2))(
        v["params"], x, cond
    )
    g_p = jax.grad(lambda p, a, c: loss(m_p, p, a, c), argnums=(0, 1, 2))(
        v["params"], x, cond
    )
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=2e-6 * max(1.0, float(jnp.max(jnp.abs(b)))), rtol=2e-5,
        )


def test_fused_coupling_bf16_close(_fused_interpret):
    """bf16 net dtype: the kernel accumulates matmuls in f32 (XLA's
    bf16 convs round per-op), so agreement is at bf16 resolution."""
    x = _rand(0, (2, 8, 16, 12))
    cond = _rand(1, (1, 8, 16, 16))
    m_x, m_p = _coupling_pair(jnp.bfloat16)
    v = _perturbed_init(m_x, x, cond)
    y_x, ld_x = m_x.apply(v, x, cond)
    y_p, ld_p = m_p.apply(v, x, cond)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(ld_p), np.asarray(ld_x),
                               atol=0.05 * abs(float(ld_x.ravel()[0])) + 0.5)


def test_model_with_fused_coupling_matches_xla_model(_fused_interpret):
    """Whole-model equivalence: use_pallas=True (fused kernel,
    interpret) vs the XLA path — NLL and reconstruction."""
    from tpuflow.configs.config import ModelConfig
    from tpuflow.data import generate_case
    from tpuflow.models import TMGlow, init_lstm_state

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
    np.testing.assert_allclose(np.asarray(bpd_p), np.asarray(bpd_x),
                               atol=1e-5, rtol=1e-5)

    from tpuflow.models.tmglow import TMGlow as T
    lat, _, _, s1 = m_p.apply(v, hf0, lf0, state, method=T.encode_step)
    x_rec, _ = m_p.apply(v, lat, lf0, state, method=T.reconstruct_step)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(hf0),
                               atol=1e-4, rtol=0)
