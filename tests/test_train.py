"""Training tests: windowed-BPTT loss, overfit smoke (NLL decreases),
data-parallel sharding over 8 fake devices, checkpoint resume
(SURVEY.md §4 integration + distributed-without-a-cluster)."""


import dataclasses
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.configs.config import CaseConfig, DataConfig, ModelConfig, TrainConfig
from tpuflow.data import generate_case
from tpuflow.models import TMGlow, init_lstm_state
from tpuflow.train import Trainer, make_mesh, make_train_step, window_bpd_fn
from tpuflow.train.mesh import data_sharding, shard_batch
from tpuflow.train.step import make_optimizer, make_trajectory_train_step
from tpuflow.utils.logging import MetricsLogger

MC = ModelConfig(
    n_scales=2, n_flow_steps=2, channels=3, hf_shape=(16, 32),
    lf_shape=(4, 8), coupling_width=8, coupling_layers=2, growth_rate=4,
    encoder_width=8, lstm_hidden=8, cond_channels=8,
    compute_dtype="float32", use_pallas=False,
)


def _tiny_cfg(tmp_path, **train_kw):
    return CaseConfig(
        name="backward-step",
        model=MC,
        data=DataConfig(
            synthetic=True, case="backward-step", window=2, train_steps=4,
            n_train_traj=8, n_test_traj=2, batch_size=8, seed=0,
        ),
        train=TrainConfig(
            epochs=2, lr=5e-4, checkpoint_dir=str(tmp_path), log_every=1000,
            checkpoint_every=2, **train_kw,
        ),
    )


def test_window_bpd_runs_and_differentiable():
    model = TMGlow(MC)
    lf, hf = generate_case("backward-step", 2, 3, MC.hf_shape, MC.lf_shape, 0)
    state = init_lstm_state(MC, (2,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(hf[:, 0]), jnp.asarray(lf[:, 0]), state
    )
    loss_fn = window_bpd_fn(model, remat=True)
    bpd, new_state = loss_fn(
        variables["params"], variables["buffers"],
        jnp.asarray(lf), jnp.asarray(hf), state,
    )
    assert np.isfinite(bpd)
    # remat path still differentiates.
    g = jax.grad(
        lambda p: loss_fn(p, variables["buffers"], jnp.asarray(lf),
                          jnp.asarray(hf), state)[0]
    )(variables["params"])
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_trainer_overfit_smoke(tmp_path):
    """NLL decreases when overfitting a tiny dataset (SURVEY.md §4
    property test)."""
    cfg = _tiny_cfg(tmp_path)
    tr = Trainer(cfg, logger=MetricsLogger(quiet=True))
    tr.init_or_resume()
    first = tr.run(epochs=1)
    last = tr.run(epochs=4)
    assert last["mean_bpd"] < first["mean_bpd"], (first, last)


def test_train_step_sharded_8dev_matches_single(tmp_path):
    """The mesh data-parallel path on 8 fake CPU devices computes the
    same update as single-device (psum-of-grads == full-batch grads)."""
    model = TMGlow(MC)
    opt = make_optimizer(1e-3, 1.0, 10.0)
    lf, hf = generate_case("backward-step", 8, 2, MC.hf_shape, MC.lf_shape, 1)
    lf, hf = jnp.asarray(lf), jnp.asarray(hf)
    state = init_lstm_state(MC, (8,))
    variables = model.init(jax.random.PRNGKey(0), hf[:, 0], lf[:, 0], state)
    params, buffers = variables["params"], variables["buffers"]
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(model, opt, remat=False))

    # Single device (default placement).
    p1, _, _, m1 = step(params, buffers, opt_state, lf, hf, state)

    # 8-device mesh, batch sharded.
    mesh = make_mesh(data=8, ensemble=1)
    ds = data_sharding(mesh)
    lf_s, hf_s = jax.device_put(lf, ds), jax.device_put(hf, ds)
    state_s = shard_batch(state, mesh, ds)
    p8, _, _, m8 = step(params, buffers, opt_state, lf_s, hf_s, state_s)

    np.testing.assert_allclose(float(m1["bpd"]), float(m8["bpd"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_fused_windows_matches_per_window():
    """The trajectory-scan train step reproduces the per-window update
    sequence exactly (same truncation + Adam ordering)."""
    model = TMGlow(MC)
    opt = make_optimizer(1e-3, 1.0, 10.0)
    window, t = 2, 6
    lf, hf = generate_case("backward-step", 4, t, MC.hf_shape, MC.lf_shape, 2)
    lf, hf = jnp.asarray(lf), jnp.asarray(hf)
    state = init_lstm_state(MC, (4,))
    variables = model.init(jax.random.PRNGKey(0), hf[:, 0], lf[:, 0], state)
    params, buffers = variables["params"], variables["buffers"]
    opt_state = opt.init(params)

    # Per-window reference.
    step = jax.jit(make_train_step(model, opt, remat=False))
    p_ref, o_ref, s = params, opt_state, state
    losses_ref = []
    for w0 in range(0, t, window):
        p_ref, o_ref, s, m = step(
            p_ref, buffers, o_ref,
            lf[:, w0 : w0 + window], hf[:, w0 : w0 + window], s,
        )
        losses_ref.append(float(m["bpd"]))

    # Fused trajectory scan.
    traj_step = jax.jit(make_trajectory_train_step(model, opt, window, remat=False))
    p_fused, o_fused, m = traj_step(params, buffers, opt_state, lf, hf)
    np.testing.assert_allclose(
        np.asarray(m["bpd_per_window"]), losses_ref, rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(p_fused), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_window_longer_than_trajectory_rejected(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, window=99))
    with pytest.raises(ValueError, match="exceeds the dataset"):
        Trainer(cfg, logger=MetricsLogger(quiet=True))


def test_rerun_after_completion_is_noop(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    tr = Trainer(cfg, logger=MetricsLogger(quiet=True))
    tr.init_or_resume()
    tr.run(epochs=1)
    tr.save()
    tr2 = Trainer(cfg, logger=MetricsLogger(quiet=True))
    tr2.init_or_resume()
    out = tr2.run(epochs=1)
    assert out["epoch"] == 1 and np.isnan(out["mean_bpd"])


def test_make_mesh_rejects_bad_axes():
    from tpuflow.train.mesh import make_mesh

    with pytest.raises(ValueError, match="must be >=1"):
        make_mesh(data=0, ensemble=8)
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(data=-1, ensemble=3)  # 8 devices
    with pytest.raises(ValueError, match="needs"):
        make_mesh(data=8, ensemble=2)


def test_training_deterministic(tmp_path):
    """Same config + seeds => bit-identical parameters (SURVEY.md §5
    failure-recovery contract: deterministic resume/rerun)."""
    import jax

    results = []
    for i in range(2):
        cfg = _tiny_cfg(tmp_path / f"run{i}")
        tr = Trainer(cfg, logger=MetricsLogger(quiet=True))
        tr.init_or_resume()
        tr.run(epochs=1)
        results.append(jax.tree.leaves(tr.params))
    for a, b in zip(*results):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    tr = Trainer(cfg, logger=MetricsLogger(quiet=True))
    tr.init_or_resume()
    tr.run(epochs=2)  # checkpoints at epoch 2
    step_before = tr.global_step
    bpd_ref = float(
        jax.tree.leaves(tr.params)[0].sum()
    )

    tr2 = Trainer(cfg, logger=MetricsLogger(quiet=True))
    tr2.init_or_resume()
    assert tr2.epoch == 2 and tr2.global_step == step_before
    np.testing.assert_allclose(
        float(jax.tree.leaves(tr2.params)[0].sum()), bpd_ref, rtol=1e-6
    )


def test_remat_matches_no_remat():
    """remat is pure recompute: one train step with remat on and off
    must produce identical params/metrics (the default flipped to
    remat=false for throughput — this guards the equivalence)."""
    model = TMGlow(MC)
    lf, hf = generate_case("backward-step", 2, 3, MC.hf_shape, MC.lf_shape, 5)
    lf_w, hf_w = jnp.asarray(lf), jnp.asarray(hf)
    state = init_lstm_state(MC, (2,))
    variables = model.init(
        jax.random.PRNGKey(0), hf_w[:, 0], lf_w[:, 0], state
    )
    opt = make_optimizer(1e-3, 0.99, 1.0)
    opt_state = opt.init(variables["params"])
    outs = []
    for remat in (True, False):
        step = jax.jit(make_train_step(model, opt, remat=remat))
        p, _, _, m = step(
            jax.tree.map(jnp.copy, variables["params"]),
            variables.get("buffers", {}),
            jax.tree.map(jnp.copy, opt_state),
            lf_w, hf_w, state,
        )
        outs.append((p, m))
    (p1, m1), (p2, m2) = outs
    assert np.allclose(float(m1["bpd"]), float(m2["bpd"]), atol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_device_resident_matches_host_upload(tmp_path):
    """The device-resident gather path trains bit-identically to the
    per-batch host-upload path (same shuffle, same updates)."""
    results = {}
    for resident in (True, False):
        cfg = _tiny_cfg(tmp_path / f"r{resident}")
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, device_resident=resident)
        )
        tr = Trainer(cfg, logger=MetricsLogger(quiet=True))
        assert tr._resident == resident
        tr.init_or_resume()
        out = tr.run(epochs=2)
        results[resident] = (out, tr.params)
    (m1, p1), (m2, p2) = results[True], results[False]
    assert np.isclose(m1["mean_bpd"], m2["mean_bpd"], atol=1e-6), (m1, m2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_trainer_periodic_validation(tmp_path):
    """train.eval_every computes held-out NLL on the test split (TRAIN
    normalization constants) and appends val_log.csv rows."""
    import csv

    cfg = _tiny_cfg(tmp_path, eval_every=1)
    tr = Trainer(cfg, logger=MetricsLogger(quiet=True))
    tr.init_or_resume()
    last = tr.run(epochs=2)
    assert np.isfinite(last["val_bpd"])
    # The lazy validation dataset reused the train constants.
    np.testing.assert_array_equal(
        tr._val_norm.to_dict()["hf_mean"],
        tr.dataset.norm.to_dict()["hf_mean"],
    )
    with open(tmp_path / "backward-step" / "val_log.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2  # one per epoch at eval_every=1
    assert {r["epoch"] for r in rows} == {"1.0", "2.0"}
    assert all(np.isfinite(float(r["val_bpd"])) for r in rows)


def test_trainer_eval_every_requires_test_split(tmp_path):
    """train.eval_every fails at STARTUP when the test archive is
    missing — not hours later at the first validation boundary."""
    import pytest

    from tpuflow.data import generate_case
    from tpuflow.data.dataset import save_archive

    lf, hf = generate_case("backward-step", 4, 4, MC.hf_shape, MC.lf_shape, 0)
    save_archive(tmp_path / "data" / "backward-step_train.npz", lf, hf)
    cfg = _tiny_cfg(tmp_path, eval_every=1)
    cfg = CaseConfig(
        name=cfg.name, model=cfg.model, train=cfg.train, eval=cfg.eval,
        data=DataConfig(
            synthetic=False, case="backward-step",
            data_dir=str(tmp_path / "data"), window=2, batch_size=4,
        ),
    )
    with pytest.raises(ValueError, match="test split"):
        Trainer(cfg, logger=MetricsLogger(quiet=True))
