"""Torch-checkpoint converter tests: layout rules, roundtrip through a
real torch state_dict, shape validation (SURVEY.md §5 checkpoint row)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax


from tpuflow.configs.config import CaseConfig, DataConfig, ModelConfig
from tpuflow.models import TMGlow, init_lstm_state
from tpuflow.tools.convert_torch import (
    _validate_against_model,
    convert_state_dict,
    torch_tensor_to_flax,
)

MC = ModelConfig(
    n_scales=2, n_flow_steps=2, channels=3, hf_shape=(16, 32),
    lf_shape=(4, 8), coupling_width=8, coupling_layers=2, growth_rate=4,
    encoder_width=8, lstm_hidden=8, cond_channels=8,
    compute_dtype="float32", use_pallas=False,
)


def test_layout_rules():
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    out = torch_tensor_to_flax("kernel", w)
    assert out.shape == (5, 7, 3, 2)  # OIHW -> HWIO
    lin = np.arange(6).reshape(2, 3).astype(np.float32)
    assert torch_tensor_to_flax("kernel", lin).shape == (3, 2)
    b = np.arange(4).astype(np.float32)
    np.testing.assert_array_equal(torch_tensor_to_flax("bias", b), b)


def _model_params():
    # Random init batch: ActNorm's data-dependent init degenerates on
    # constant inputs (std=0 -> 1e6 scales).
    model = TMGlow(MC)
    hf = jax.random.normal(jax.random.PRNGKey(1), (1, *MC.hf_shape, 3))
    lf = jax.random.normal(jax.random.PRNGKey(2), (1, *MC.lf_shape, 3))
    variables = model.init(
        jax.random.PRNGKey(0), hf, lf, init_lstm_state(MC, (1,))
    )
    return variables["params"]


def _params_to_torch_state_dict(params):
    """Inverse mapping: flax params -> torch-convention state_dict."""
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [str(p.key) for p in path]
        arr = np.asarray(leaf, dtype=np.float32)
        name = ".".join(keys)
        if keys[-1] == "kernel":
            name = ".".join(keys[:-1]) + ".weight"
            if arr.ndim == 4:  # HWIO -> OIHW
                arr = np.transpose(arr, (3, 2, 0, 1))
            elif arr.ndim == 2:
                arr = np.transpose(arr, (1, 0))
        sd[name] = torch.from_numpy(arr.copy())
    return sd


def test_convert_roundtrip_and_validation():
    params = _model_params()
    sd = _params_to_torch_state_dict(params)
    converted = convert_state_dict(sd)

    cfg = CaseConfig(name="backward-step", model=MC, data=DataConfig())
    problems = _validate_against_model(converted, cfg)
    assert problems == [], problems[:5]

    # Values roundtrip exactly.
    ref = jax.tree_util.tree_flatten_with_path(params)[0]
    got = jax.tree_util.tree_flatten_with_path(converted)[0]
    assert len(ref) == len(got)
    for (pa, a), (pb, b) in zip(sorted(ref, key=str), sorted(got, key=str)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Converted params drive the real model.
    model = TMGlow(MC)
    hf = jax.random.normal(jax.random.PRNGKey(1), (1, *MC.hf_shape, 3))
    lf = jax.random.normal(jax.random.PRNGKey(2), (1, *MC.lf_shape, 3))
    buffers = model.init(
        jax.random.PRNGKey(0), hf, lf, init_lstm_state(MC, (1,))
    )["buffers"]
    bpd, _ = model.apply(
        {"params": converted, "buffers": buffers},
        hf, lf, init_lstm_state(MC, (1,)),
    )
    assert np.all(np.isfinite(bpd))


def test_validation_catches_mismatch():
    params = _model_params()
    sd = _params_to_torch_state_dict(params)
    sd.pop(sorted(sd)[0])  # drop one tensor
    converted = convert_state_dict(sd)
    cfg = CaseConfig(name="backward-step", model=MC, data=DataConfig())
    problems = _validate_against_model(converted, cfg)
    assert any("missing" in p for p in problems)
