"""Per-bijector property tests: reverse(forward(x)) ≈ x and
logdet ≡ log|det ∂f/∂x| computed by autodiff on small shapes
(SURVEY.md §4 unit-test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.flows import (
    ActNorm,
    AffineCoupling,
    ConditionalPrior,
    ConditionalSplit,
    InvConv1x1LU,
    gaussian_logp,
    squeeze2d,
    unsqueeze2d,
)

B, H, W, C = 2, 4, 4, 4
COND_C = 3


def _rand(rng, shape):
    return jax.random.normal(rng, shape, dtype=jnp.float32)


def _check_roundtrip(module, variables, x, cond=None, tol=1e-4, **kw):
    args_f = (x,) if cond is None else (x, cond)
    z, ld_f = module.apply(variables, *args_f, reverse=False, **kw)
    args_r = (z,) if cond is None else (z, cond)
    x_rec, ld_r = module.apply(variables, *args_r, reverse=True, **kw)
    np.testing.assert_allclose(x_rec, x, atol=tol, rtol=0)
    np.testing.assert_allclose(ld_f, -ld_r, atol=1e-4, rtol=1e-5)
    return z, ld_f


def _check_logdet_vs_jacobian(fwd_flat, x, logdet, tol=1e-3):
    """fwd_flat: (D,) -> (D,) single-example flat transform."""
    x0 = x[0].reshape(-1)
    jac = jax.jacfwd(fwd_flat)(x0)
    _, ref = jnp.linalg.slogdet(jac)
    np.testing.assert_allclose(logdet[0], ref, atol=tol, rtol=1e-4)


def test_actnorm_roundtrip_and_init_stats():
    rng = jax.random.PRNGKey(0)
    x = 3.0 + 2.0 * _rand(rng, (B, H, W, C))
    m = ActNorm()
    variables = m.init(jax.random.PRNGKey(1), x)
    z, _ = m.apply(variables, x)
    # Data-dependent init: normalized first batch.
    np.testing.assert_allclose(np.mean(z, axis=(0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.std(z, axis=(0, 1, 2)), 1.0, atol=1e-3)
    _check_roundtrip(m, variables, x)


def test_actnorm_logdet():
    rng = jax.random.PRNGKey(2)
    x = _rand(rng, (B, H, W, C))
    m = ActNorm()
    variables = m.init(jax.random.PRNGKey(3), x)
    z, ld = m.apply(variables, x)

    def f(xf):
        out, _ = m.apply(variables, xf.reshape(1, H, W, C))
        return out.reshape(-1)

    _check_logdet_vs_jacobian(f, x, ld)


def test_inv1x1_roundtrip_logdet():
    rng = jax.random.PRNGKey(4)
    x = _rand(rng, (B, H, W, C))
    m = InvConv1x1LU()
    variables = m.init(jax.random.PRNGKey(5), x)
    z, ld = _check_roundtrip(m, variables, x)
    # At init W is a rotation: logdet == 0 and |z| == |x|.
    np.testing.assert_allclose(ld, 0.0, atol=1e-3)
    np.testing.assert_allclose(
        np.linalg.norm(z), np.linalg.norm(x), rtol=1e-5
    )

    def f(xf):
        out, _ = m.apply(variables, xf.reshape(1, H, W, C))
        return out.reshape(-1)

    _check_logdet_vs_jacobian(f, x, ld)


def test_inv1x1_logdet_after_perturbation():
    # Move log_s off zero so logdet is nontrivial, re-check vs autodiff.
    rng = jax.random.PRNGKey(6)
    x = _rand(rng, (B, H, W, C))
    m = InvConv1x1LU()
    variables = m.init(jax.random.PRNGKey(7), x)
    variables = jax.tree.map(lambda a: a, variables)  # unfreeze-safe copy
    params = dict(variables["params"])
    params["log_s"] = params["log_s"] + 0.3
    variables = {"params": params, "buffers": variables["buffers"]}
    z, ld = _check_roundtrip(m, variables, x)

    def f(xf):
        out, _ = m.apply(variables, xf.reshape(1, H, W, C))
        return out.reshape(-1)

    _check_logdet_vs_jacobian(f, x, ld)


def test_coupling_conv_layouts_agree():
    """The HWNC and NHWC coupling-net paths share one parameter tree
    (checkpoint compatibility) and compute the same function — the
    layout is a pure performance choice (flows/coupling.py)."""
    x = _rand(jax.random.PRNGKey(8), (B, H, W, C))
    cond = _rand(jax.random.PRNGKey(9), (B, H, W, COND_C))
    kw = dict(width=8, layers=2, growth_rate=4, dtype=jnp.float32)
    m_h = AffineCoupling(conv_layout="hwnc", **kw)
    m_n = AffineCoupling(conv_layout="nhwc", **kw)
    variables = m_h.init(jax.random.PRNGKey(10), x, cond)
    # Identical param trees (shapes AND names).
    v2 = m_n.init(jax.random.PRNGKey(10), x, cond)
    assert jax.tree.map(jnp.shape, variables) == jax.tree.map(jnp.shape, v2)
    # Perturb the zero-init head so the transform is nontrivial.
    params = jax.tree.map(lambda a: a, variables["params"])
    for name in list(params["net"]):
        if name.startswith("joint_"):
            kern = params["net"][name]["kernel"]
            params["net"][name]["kernel"] = kern + 0.05 * jax.random.normal(
                jax.random.PRNGKey(11), kern.shape
            )
    variables = {"params": params}
    y_h, ld_h = m_h.apply(variables, x, cond)
    y_n, ld_n = m_n.apply(variables, x, cond)
    np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_n), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_h), np.asarray(ld_n), atol=2e-4)


@pytest.mark.parametrize("with_cond", [False, True])
def test_coupling_roundtrip_logdet(with_cond):
    rng = jax.random.PRNGKey(8)
    x = _rand(rng, (B, H, W, C))
    cond = _rand(jax.random.PRNGKey(9), (B, H, W, COND_C)) if with_cond else None
    m = AffineCoupling(width=8, layers=2, growth_rate=4, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(10), x, cond)

    # Perturb the (zero-init) output-head columns so the transform is
    # nontrivial.
    params = jax.tree.map(lambda a: a, variables["params"])
    for name in list(params["net"]):
        if name.startswith(("conv_out", "joint_")):
            kern = params["net"][name]["kernel"]
            params["net"][name]["kernel"] = kern + 0.05 * jax.random.normal(
                jax.random.PRNGKey(11), kern.shape
            )
    variables = {"params": params}

    z, ld = _check_roundtrip(m, variables, x, cond)
    assert not np.allclose(z, x)

    def f(xf):
        c1 = None if cond is None else cond[:1]
        args = (xf.reshape(1, H, W, C),) if c1 is None else (
            xf.reshape(1, H, W, C), c1)
        out, _ = m.apply(variables, *args)
        return out.reshape(-1)

    _check_logdet_vs_jacobian(f, x, ld)


def test_squeeze_roundtrip_and_shape():
    rng = jax.random.PRNGKey(12)
    x = _rand(rng, (B, H, W, C))
    y = squeeze2d(x)
    assert y.shape == (B, H // 2, W // 2, 4 * C)
    np.testing.assert_array_equal(unsqueeze2d(y), x)


def test_split_logp_and_reverse():
    rng = jax.random.PRNGKey(13)
    z = _rand(rng, (B, H, W, C))
    cond = _rand(jax.random.PRNGKey(14), (B, H, W, COND_C))
    m = ConditionalSplit(dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(15), z, cond)

    keep, drop, logp = m.apply(variables, z, cond)
    assert keep.shape == (B, H, W, C // 2)
    # Zero-init prior net => prior is exactly N(0, I).
    ref = gaussian_logp(z[..., C // 2:], jnp.zeros(()), jnp.zeros(()))
    np.testing.assert_allclose(logp, ref, rtol=1e-5)

    # Reconstruction path: feeding the factored latent back is exact.
    rec, _ = m.apply(variables, keep, cond, reverse=True, drop=drop)
    np.testing.assert_array_equal(rec, z)

    # Generation path: sample the prior at temperature tau.
    out, neg_logp = m.apply(
        variables, keep, cond, reverse=True,
        rng=jax.random.PRNGKey(16), temperature=0.7,
    )
    assert out.shape == z.shape
    np.testing.assert_allclose(out[..., : C // 2], keep, atol=1e-6)
    assert np.all(np.isfinite(neg_logp))


def test_conditional_prior_logp_and_sample():
    rng = jax.random.PRNGKey(17)
    z = _rand(rng, (B, H, W, C))
    cond = _rand(jax.random.PRNGKey(18), (B, H, W, COND_C))
    m = ConditionalPrior(dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(19), z, cond)

    _, logp = m.apply(variables, z, cond)
    ref = gaussian_logp(z, jnp.zeros(()), jnp.zeros(()))
    np.testing.assert_allclose(logp, ref, rtol=1e-5)

    z_s, _ = m.apply(
        variables, C, cond, reverse=True,
        rng=jax.random.PRNGKey(20), temperature=0.0,
    )
    # Temperature 0 => the prior mean (zero at init).
    np.testing.assert_allclose(z_s, 0.0, atol=1e-6)
    assert z_s.shape == (B, H, W, C)


def test_z_clip_truncates_sampling_only():
    """z_clip bounds generative draws at ±k sigma and leaves the
    density/reconstruction paths untouched (flows/prior.py stability
    rationale: one tail latent can overflow a member through the
    reverse coupling cascade at tau >= 1)."""
    from tpuflow.flows.prior import gaussian_sample

    rng = jax.random.PRNGKey(21)
    mean = jnp.zeros((4, 64, 64, 4))
    log_std = jnp.zeros((4, 64, 64, 4))
    z_free = gaussian_sample(rng, mean, log_std, 1.0)
    z_clip = gaussian_sample(rng, mean, log_std, 1.0, z_clip=2.0)
    assert float(jnp.max(jnp.abs(z_free))) > 2.0  # 64k draws: tails exist
    assert float(jnp.max(jnp.abs(z_clip))) <= 2.0
    # Identical wherever the clip does not bind.
    inside = jnp.abs(z_free) < 2.0
    np.testing.assert_array_equal(
        np.asarray(z_free)[np.asarray(inside)],
        np.asarray(z_clip)[np.asarray(inside)],
    )

    # Module plumbing: a clipped split still reconstructs exactly and
    # samples within the bound (zero-init prior => std 1, mean 0).
    z = _rand(jax.random.PRNGKey(22), (B, H, W, C))
    cond = _rand(jax.random.PRNGKey(23), (B, H, W, COND_C))
    m = ConditionalSplit(dtype=jnp.float32, z_clip=3.0)
    variables = m.init(jax.random.PRNGKey(24), z, cond)
    keep, drop, _ = m.apply(variables, z, cond)
    rec, _ = m.apply(variables, keep, cond, reverse=True, drop=drop)
    np.testing.assert_array_equal(rec, z)
    out, _ = m.apply(
        variables, keep, cond, reverse=True,
        rng=jax.random.PRNGKey(25), temperature=1.0,
    )
    assert float(jnp.max(jnp.abs(out[..., C // 2:]))) <= 3.0


def test_actnorm_degenerate_channel_init():
    """A (near-)constant channel in the init batch must not initialize
    an unbounded amplification: log_scale is clamped so the first
    forward stays finite instead of saturating the bf16 nets."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuflow.flows.actnorm import ActNorm

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    x[..., 1] = 2.5  # constant channel -> std ~ 0
    m = ActNorm()
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ls = np.asarray(variables["params"]["log_scale"])
    assert np.all(np.isfinite(ls)) and ls.max() <= 7.0 + 1e-6
    y, logdet = m.apply(variables, jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(y)))
    assert np.all(np.isfinite(np.asarray(logdet)))


def test_gaussian_logp_multi_axis_batch():
    """gaussian_logp reduces over the field axes only (matching every
    bijector's logdet convention), so (B, T) batch shapes pass through
    instead of silently summing the extra axis."""
    import jax.numpy as jnp
    import numpy as np

    from tpuflow.flows.prior import gaussian_logp

    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(2, 5, 4, 4, 3)).astype(np.float32))
    zero = jnp.zeros_like(z)
    lp = gaussian_logp(z, zero, zero)
    assert lp.shape == (2, 5)
    # Matches the single-batch-axis value computed row by row.
    flat = gaussian_logp(z.reshape(10, 4, 4, 3), zero.reshape(10, 4, 4, 3),
                         zero.reshape(10, 4, 4, 3))
    np.testing.assert_allclose(np.asarray(lp).ravel(), np.asarray(flat),
                               rtol=1e-6)
