"""HWNC-native flow layout: parity and contracts vs the nhwc path.

flows/layout.py: under ``flow_layout="hwnc"`` every flow tensor lives
in (H, W, N, C) so the hot loops emit no layout transposes (round-1
profiling: per-coupling hwnc<->nhwc transposes were ~300 async copies
per rollout step, 68% of device time). These tests pin the contract
that makes the layout a pure implementation detail:

  * parameter trees (and data-dependent init values) are identical
    across layouts — checkpoints are layout-portable;
  * teacher-forced outputs (NLL, encode/reconstruct, train step) match
    the nhwc path numerically;
  * the invertibility gate holds in hwnc;
  * rollout outputs keep their public (T, ...) batch-major shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.configs.config import load_case
from tpuflow.models import TMGlow, init_lstm_state

SMALL = {
    "model.n_scales": 2, "model.n_flow_steps": 2,
    "model.hf_shape": (16, 32), "model.lf_shape": (8, 16),
    "model.coupling_width": 16, "model.growth_rate": 8,
    "model.coupling_layers": 2, "model.encoder_width": 8,
    "model.lstm_hidden": 8, "model.cond_channels": 8,
    "model.compute_dtype": "float32",
}


def _pair():
    cfg_n = load_case("backward-step", {**SMALL, "model.flow_layout": "nhwc"})
    cfg_h = load_case("backward-step", {**SMALL, "model.flow_layout": "hwnc"})
    return TMGlow(cfg_n.model), TMGlow(cfg_h.model), cfg_n, cfg_h


def _data(b=3):
    hf = jax.random.normal(jax.random.PRNGKey(0), (b, 16, 32, 3))
    lf = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 16, 3))
    return hf, lf


def test_param_trees_layout_independent():
    mn, mh, cfg_n, cfg_h = _pair()
    hf, lf = _data()
    vn = mn.init(jax.random.PRNGKey(42), hf, lf,
                 init_lstm_state(cfg_n.model, (3,)))
    vh = mh.init(jax.random.PRNGKey(42), hf, lf,
                 init_lstm_state(cfg_h.model, (3,)))
    assert jax.tree_util.tree_structure(vn) == jax.tree_util.tree_structure(vh)
    # Data-dependent ActNorm init reduces over all non-channel axes in
    # both layouts -> identical VALUES, not just shapes.
    for a, b in zip(jax.tree_util.tree_leaves(vn),
                    jax.tree_util.tree_leaves(vh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def bundle():
    mn, mh, cfg_n, cfg_h = _pair()
    hf, lf = _data()
    v = mn.init(jax.random.PRNGKey(42), hf, lf,
                init_lstm_state(cfg_n.model, (3,)))
    return mn, mh, cfg_n, cfg_h, v, hf, lf


def test_nll_parity(bundle):
    mn, mh, cfg_n, cfg_h, v, hf, lf = bundle
    bn, _ = mn.apply(v, hf, lf, init_lstm_state(cfg_n.model, (3,)))
    bh, _ = mh.apply(v, hf, lf, init_lstm_state(cfg_h.model, (3,)))
    np.testing.assert_allclose(np.asarray(bn), np.asarray(bh),
                               rtol=2e-5, atol=2e-5)


def test_hwnc_invertibility(bundle):
    mn, mh, cfg_n, cfg_h, v, hf, lf = bundle
    s = init_lstm_state(cfg_h.model, (3,))
    lat, ld, lp, _ = mh.apply(v, hf, lf, s, method=TMGlow.encode_step)
    xr, _ = mh.apply(v, lat, lf, s, method=TMGlow.reconstruct_step)
    assert float(jnp.max(jnp.abs(xr - hf))) < 1e-4
    assert np.isfinite(np.asarray(ld)).all()
    assert np.isfinite(np.asarray(lp)).all()


def test_hwnc_sample_step_batch_major(bundle):
    mn, mh, cfg_n, cfg_h, v, hf, lf = bundle
    s = init_lstm_state(cfg_h.model, (3,))
    x, _ = mh.apply(v, lf, s, jax.random.PRNGKey(7), 0.7,
                    method=TMGlow.sample_step)
    assert x.shape == hf.shape  # public API stays (N, H, W, C)
    assert np.isfinite(np.asarray(x)).all()


def test_rollout_shapes_and_stat_parity(bundle):
    from tpuflow.eval.rollout import make_ensemble_rollout

    mn, mh, cfg_n, cfg_h, v, hf, lf = bundle
    lft = jax.random.normal(jax.random.PRNGKey(3), (5, 8, 16, 3))
    on = jax.jit(make_ensemble_rollout(mn, 16, 0.7, "stats"))(
        v, lft, jax.random.PRNGKey(9))
    oh = jax.jit(make_ensemble_rollout(mh, 16, 0.7, "stats"))(
        v, lft, jax.random.PRNGKey(9))
    assert on["mean"].shape == oh["mean"].shape == (5, 16, 32, 3)
    # Same params, same trajectory: per-step ensemble means agree to
    # sampling noise (16 members; latent draws differ elementwise
    # because the draw SHAPE differs between layouts).
    d = np.abs(np.asarray(on["mean"]) - np.asarray(oh["mean"])).mean()
    spread = float(np.sqrt(np.asarray(on["var"]).mean()) / np.sqrt(16))
    assert d < 6 * max(spread, 1e-3)

    of = jax.jit(make_ensemble_rollout(mh, 4, 0.7, "fields"))(
        v, lft, jax.random.PRNGKey(9))
    assert of.shape == (5, 4, 16, 32, 3)


@pytest.mark.slow  # 20s+ on the 1-core bench host
def test_train_step_parity(bundle):
    from tpuflow.train.step import make_optimizer, make_trajectory_train_step

    mn, mh, cfg_n, cfg_h, v, hf, lf = bundle
    B, T, W = 2, 8, 4
    hft = jax.random.normal(jax.random.PRNGKey(4), (B, T, 16, 32, 3))
    lft = jax.random.normal(jax.random.PRNGKey(5), (B, T, 8, 16, 3))
    opt = make_optimizer(1e-3, 0.0, 1.0, 0.0)
    outs = {}
    for name, m in (("nhwc", mn), ("hwnc", mh)):
        step = jax.jit(make_trajectory_train_step(m, opt, W, remat=True))
        p, o, met = step(v["params"], v["buffers"], opt.init(v["params"]),
                         lft, hft)
        outs[name] = (float(met["bpd"]), p)
    assert abs(outs["nhwc"][0] - outs["hwnc"][0]) < 2e-5
    d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(outs["nhwc"][1]),
        jax.tree_util.tree_leaves(outs["hwnc"][1])))
    assert d < 1e-4


@pytest.mark.slow  # 20s+ on the 1-core bench host
def test_hwnc_sharded_rollout_parity():
    """8 fake devices: ensemble axis sharded at member_axis=2."""
    from tpuflow.eval.rollout import make_ensemble_rollout
    from tpuflow.train.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = load_case("backward-step", {**SMALL, "model.flow_layout": "hwnc"})
    m = TMGlow(cfg.model)
    hf, lf = _data(1)
    v = m.init(jax.random.PRNGKey(42), hf, lf,
               init_lstm_state(cfg.model, (1,)))
    lft = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 16, 3))
    mesh = make_mesh(data=4, ensemble=2)
    single = jax.jit(make_ensemble_rollout(m, 16, 0.7, "stats"))
    sharded = jax.jit(make_ensemble_rollout(m, 16, 0.7, "stats", mesh=mesh))
    o1 = single(v, lft, jax.random.PRNGKey(9))
    o2 = sharded(v, lft, jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(o1["mean"]), np.asarray(o2["mean"]),
                               rtol=1e-4, atol=1e-4)


def test_invalid_layout_combos_rejected():
    with pytest.raises(ValueError, match="conv_layout"):
        load_case("backward-step", {
            "model.flow_layout": "hwnc", "model.conv_layout": "nhwc"})
    with pytest.raises(ValueError, match="use_pallas"):
        load_case("backward-step", {
            "model.flow_layout": "hwnc", "model.use_pallas": True})


# ---------------------------------------------------------------------------
# Supported configuration matrix (VERDICT r2 item 8): conv_layout x
# flow_layout x use_pallas is a PARTIALLY-valid grid — this test is the
# single source of truth enumerating every cell, in sync with the table
# in docs/PERF_NOTES.md ("Supported path matrix") and the validation in
# configs/config.py. A new combination must be added HERE (and there)
# or validation must reject it.
# ---------------------------------------------------------------------------

# (conv_layout, flow_layout, use_pallas) -> valid?
PATH_MATRIX = {
    ("hwnc", "nhwc", False): True,   # DEFAULT: hwnc conv compute, nhwc flow
    ("hwnc", "nhwc", True):  True,   # conv_layout is ignored by the fused
                                     # dispatch (and used by its CPU fallback)
    ("nhwc", "nhwc", False): True,   # reference-shaped everywhere
    ("nhwc", "nhwc", True):  True,   # fused Pallas kernel path
    ("hwnc", "hwnc", False): True,   # transpose-free flow (r2 study)
    ("hwnc", "hwnc", True):  False,  # kernel consumes member-major tiles
    ("nhwc", "hwnc", False): False,  # hwnc flow requires hwnc conv
    ("nhwc", "hwnc", True):  False,
}


def test_path_matrix_enumeration():
    """Every cell of the 2x2x2 grid behaves exactly as PATH_MATRIX says:
    valid cells construct, invalid cells raise ValueError at validate."""
    for (conv, flow, pallas), valid in PATH_MATRIX.items():
        overrides = {
            **SMALL,
            "model.conv_layout": conv,
            "model.flow_layout": flow,
            "model.use_pallas": pallas,
        }
        if valid:
            cfg = load_case("backward-step", overrides)
            assert cfg.model.conv_layout == conv
        else:
            with pytest.raises(ValueError):
                load_case("backward-step", overrides)


def test_path_matrix_valid_cells_numerically_agree():
    """All VALID non-Pallas cells produce the same teacher-forced NLL
    from the same parameters (checkpoint portability across the whole
    matrix). The Pallas cell's numeric parity is pinned separately in
    tests/test_kernels.py (interpret mode on CPU, compiled in bench)."""
    hf, lf = _data()
    outs = {}
    for (conv, flow, pallas), valid in PATH_MATRIX.items():
        if not valid or pallas:
            continue
        cfg = load_case("backward-step", {
            **SMALL,
            "model.conv_layout": conv,
            "model.flow_layout": flow,
        })
        m = TMGlow(cfg.model)
        v = m.init(jax.random.PRNGKey(42), hf, lf,
                   init_lstm_state(cfg.model, (3,)))
        bpd, _ = m.apply(v, hf, lf, init_lstm_state(cfg.model, (3,)))
        outs[(conv, flow)] = np.asarray(bpd)
    vals = list(outs.values())
    for other in vals[1:]:
        np.testing.assert_allclose(vals[0], other, rtol=2e-4, atol=2e-4)
