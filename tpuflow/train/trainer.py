"""Trainer: epoch loop, truncated-BPTT windows, sharding, checkpointing.

Parity: SURVEY.md §3.1 training call stack (L4) — args → data → model →
epoch loop over trajectory batches → consecutive BPTT windows with
carried-and-detached ConvLSTM state → Adam + lr decay + grad clip →
epoch-tagged checkpoints with deterministic resume.

TPU-first: one jitted train step compiled once (static window/batch
shapes); trajectory batches sharded over the mesh data axis with
replicated parameters — XLA emits the gradient all-reduce (SURVEY.md
§5). ActNorm data-dependent init happens in ``model.init`` on the
first real batch (functional equivalent of the reference's
first-forward init, SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.configs.config import CaseConfig
from tpuflow.data.dataset import TrajectoryDataset, load_dataset
from tpuflow.models.tmglow import TMGlow, init_lstm_state
from tpuflow.train.checkpoint import Checkpointer, abstract_checkpoint_target
from tpuflow.train.mesh import (
    data_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from tpuflow.train.step import (
    make_optimizer,
    make_resident_trajectory_train_step,
    make_train_step,
    make_trajectory_train_step,
)
from tpuflow.utils.logging import MetricsLogger


class Trainer:
    """End-to-end NLL training for one case config."""

    def __init__(
        self,
        cfg: CaseConfig,
        dataset: TrajectoryDataset | None = None,
        logger: MetricsLogger | None = None,
        mesh=None,
    ):
        cfg.validate()
        self.cfg = cfg
        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.dataset = dataset or load_dataset(cfg.data, cfg.model, "train")
        self.model = TMGlow(cfg.model)
        if mesh is None:
            data_ax = cfg.train.mesh_data
            if data_ax == -1:
                # Auto: largest device count that divides the batch
                # (an 8-device host with batch 4 -> 4-way data mesh).
                n = len(jax.devices()) // max(cfg.train.mesh_ensemble, 1)
                if n < 1:
                    raise ValueError(
                        f"mesh_ensemble={cfg.train.mesh_ensemble} needs at "
                        f"least that many devices, have {len(jax.devices())}"
                    )
                b = cfg.data.batch_size
                while n > 1 and b % n:
                    n -= 1
                data_ax = n
            mesh = make_mesh(data_ax, cfg.train.mesh_ensemble)
        self.mesh = mesh
        if cfg.data.window > self.dataset.n_steps:
            raise ValueError(
                f"data.window={cfg.data.window} exceeds the dataset's "
                f"trajectory length {self.dataset.n_steps}: no BPTT window "
                "fits, so training would silently do nothing"
            )
        if cfg.train.eval_every and not cfg.data.synthetic:
            # Fail at STARTUP if the test split is missing, not hours
            # into the run at the first eval_every boundary (validation
            # loads it lazily).
            import pathlib as _pl

            from tpuflow.data.dataset import _find_archive

            try:
                _find_archive(_pl.Path(cfg.data.data_dir), cfg.data.case, "test")
            except FileNotFoundError as e:
                raise ValueError(
                    f"train.eval_every={cfg.train.eval_every} needs the test "
                    f"split, which is not available: {e}"
                ) from e
        self.optimizer = make_optimizer(
            cfg.train.lr, cfg.train.lr_decay, cfg.train.grad_clip,
            cfg.train.weight_decay,
        )
        self.logger = logger or MetricsLogger()
        self.ckpt = Checkpointer(f"{cfg.train.checkpoint_dir}/{cfg.name}")
        self._train_step = jax.jit(
            make_train_step(self.model, self.optimizer, remat=cfg.train.remat),
            donate_argnums=(0, 2, 5),  # params, opt_state, lstm state
        )
        self._traj_step = jax.jit(
            make_trajectory_train_step(
                self.model, self.optimizer, cfg.data.window,
                remat=cfg.train.remat,
            ),
            donate_argnums=(0, 2),  # params, opt_state
        )
        # Device-resident fast path: whole split on device, batches
        # gathered by index (see make_resident_trajectory_train_step).
        self._resident = (
            cfg.data.device_resident
            and cfg.train.fused_windows
            and isinstance(self.dataset, TrajectoryDataset)
            and (self.dataset.lf.nbytes + self.dataset.hf.nbytes)
            <= cfg.data.device_resident_max_gb * 2**30
        )
        if self._resident:
            self._resident_step = jax.jit(
                make_resident_trajectory_train_step(
                    self.model, self.optimizer, cfg.data.window,
                    remat=cfg.train.remat,
                    batch_sharding=data_sharding(self.mesh),
                ),
                donate_argnums=(0, 2),  # params, opt_state (NOT the data)
            )
            self._lf_all = self._hf_all = None  # uploaded lazily once
        # Populated by init_or_resume().
        self.params = None
        self.buffers = None
        self.opt_state = None
        self.epoch = 0
        self.global_step = 0

    # ------------------------------------------------------------- init

    def _abstract_state(self):
        """Shape-only image of the checkpointed state pytree — shared
        contract with eval-time loading (see abstract_checkpoint_target)."""
        return abstract_checkpoint_target(
            self.model, self.optimizer, self.cfg.model,
            batch_size=self.cfg.data.batch_size,
        )

    def init_or_resume(self) -> None:
        restored = None
        if self.ckpt.latest_step() is not None:
            restored = self.ckpt.restore(target=self._abstract_state())
        if restored is not None:
            state, meta = restored["state"], restored["meta"]
            self.params = state["params"]
            self.buffers = state["buffers"]
            self.opt_state = state["opt_state"]
            self.epoch = int(meta["epoch"])
            self.global_step = int(meta["global_step"])
            from tpuflow.data.dataset import NormStats
            from tpuflow.data.tpf import StreamingTrajectoryDataset

            if isinstance(self.dataset, StreamingTrajectoryDataset):
                # Checkpointed constants are authoritative AND spare the
                # streaming path its full-dataset normalization sweep.
                self.dataset.norm = NormStats.from_dict(
                    {k: np.asarray(v) for k, v in state["norm"].items()}
                )
            print(f"resumed from epoch {self.epoch} (step {self.global_step})")
        else:
            self._fresh_init()
        # Replicate training state across the mesh.
        rep = replicated_sharding(self.mesh)
        self.params = jax.device_put(self.params, rep)
        self.buffers = jax.device_put(self.buffers, rep)
        self.opt_state = jax.device_put(self.opt_state, rep)

    def _fresh_init(self) -> None:
        cfg = self.cfg
        b = cfg.data.batch_size
        # ActNorm data-dependent init must see a REAL first batch
        # (SURVEY.md §3.3 ordering constraint).
        lf_b, hf_b = next(self.dataset.traj_batches(cfg.data.seed, b))
        state = init_lstm_state(cfg.model, (b,))
        variables = self.model.init(
            jax.random.PRNGKey(cfg.train.seed),
            jnp.asarray(hf_b[:, 0]), jnp.asarray(lf_b[:, 0]), state,
        )
        self.params = variables["params"]
        self.buffers = variables.get("buffers", {})
        self.opt_state = self.optimizer.init(self.params)
        n_params = sum(int(p.size) for p in jax.tree.leaves(self.params))
        print(f"initialized {n_params:,} parameters")

    # ------------------------------------------------------------ train

    def run(self, epochs: int | None = None) -> dict[str, Any]:
        """Train for ``epochs`` (default: config), return final metrics."""
        if self.params is None:
            self.init_or_resume()
        cfg = self.cfg
        epochs = cfg.train.epochs if epochs is None else epochs
        if self.epoch >= epochs:
            print(
                f"already trained to epoch {self.epoch} (>= {epochs}); "
                "nothing to do"
            )
            return {"epoch": self.epoch, "mean_bpd": float("nan"),
                    "windows_per_sec": 0.0}

        from tpuflow.utils.profiling import trace_context

        with trace_context(cfg.train.trace_dir or None):
            return self._epoch_loop(epochs)

    def _epoch_loop(self, epochs: int) -> dict[str, Any]:
        cfg = self.cfg
        window = cfg.data.window
        b = cfg.data.batch_size
        ds = data_sharding(self.mesh)
        last: dict[str, Any] = {}
        while self.epoch < epochs:
            epoch_t0 = time.perf_counter()
            epoch_bpd, n_windows = 0.0, 0
            # Device-side metric accumulators: converting a metric to a
            # Python float every batch would block on the step and
            # serialize host->device transfer with compute (async
            # dispatch lets the next batch upload while this one runs).
            pending: list = []

            def record(n_win, metrics):
                # Shared per-step bookkeeping for all three paths:
                # device-side accumulation + log on log_every crossings.
                nonlocal n_windows
                self.global_step += n_win
                pending.append((n_win, metrics))
                n_windows += n_win
                if cfg.train.log_every and (
                    self.global_step // cfg.train.log_every
                    != (self.global_step - n_win) // cfg.train.log_every
                ):
                    self.logger.log(
                        self.global_step,
                        epoch=self.epoch,
                        bpd=metrics["bpd"],
                        grad_norm=metrics["grad_norm"],
                    )

            if self._resident:
                if self._lf_all is None:
                    # One-time upload of the whole split, replicated
                    # across the mesh (size-guarded in __init__).
                    rep = replicated_sharding(self.mesh)
                    self._lf_all = jax.device_put(self.dataset.lf, rep)
                    self._hf_all = jax.device_put(self.dataset.hf, rep)
                n_win_per = self.dataset.n_steps // window
                for idx in self.dataset.batch_indices(
                    cfg.data.seed + self.epoch, b
                ):
                    (self.params, self.opt_state, metrics) = (
                        self._resident_step(
                            self.params, self.buffers, self.opt_state,
                            self._lf_all, self._hf_all, jnp.asarray(idx),
                        )
                    )
                    record(n_win_per, metrics)
            else:
                for lf_traj, hf_traj in self.dataset.traj_batches(
                    cfg.data.seed + self.epoch, b
                ):
                    if cfg.train.fused_windows:
                        # device_put straight from the numpy batch: each
                        # shard uploads once to its own device
                        # (jnp.asarray first would commit the whole
                        # batch to device 0 and then reshard).
                        lf_d = jax.device_put(lf_traj, ds)
                        hf_d = jax.device_put(hf_traj, ds)
                        (self.params, self.opt_state, metrics) = (
                            self._traj_step(
                                self.params, self.buffers, self.opt_state,
                                lf_d, hf_d,
                            )
                        )
                        record(lf_traj.shape[1] // window, metrics)
                        continue
                    # Per-window path: fresh recurrent state per
                    # trajectory batch; carried (values only —
                    # truncation) across windows within it.
                    state = init_lstm_state(cfg.model, (b,))
                    state = shard_batch(state, self.mesh, ds)
                    for lf_win, hf_win in TrajectoryDataset.windows(
                        lf_traj, hf_traj, window
                    ):
                        lf_d = jax.device_put(lf_win, ds)
                        hf_d = jax.device_put(hf_win, ds)
                        (self.params, self.opt_state, state, metrics) = (
                            self._train_step(
                                self.params, self.buffers, self.opt_state,
                                lf_d, hf_d, state,
                            )
                        )
                        record(1, metrics)
            # Drain device-side metrics once per epoch (single sync).
            for n_win, m in pending:
                epoch_bpd += float(m["bpd"]) * n_win
            epoch_dt = time.perf_counter() - epoch_t0
            self.epoch += 1
            # "epoch" = COMPLETED-epoch count, matching the
            # already-trained early return in run() (a completed
            # N-epoch run and its no-op re-invocation report the same
            # number).
            last = {
                "epoch": self.epoch,
                "mean_bpd": epoch_bpd / max(n_windows, 1),
                "windows_per_sec": n_windows / epoch_dt,
            }
            if (
                self.epoch % cfg.train.checkpoint_every == 0
                or self.epoch == epochs
            ):
                self.save()
            if cfg.train.plot_every and self.epoch % cfg.train.plot_every == 0:
                self._plot_sample()
            if cfg.train.eval_every and self.epoch % cfg.train.eval_every == 0:
                last["val_bpd"] = self._validate()
        return last

    def _validate(self) -> float:
        """Held-out NLL (bits/dim) over the whole test split, logged to
        val_log.csv (the paper's train/validation monitoring). The test
        split is normalized with the TRAIN constants — identical to
        evaluation-time loading; the scan is jitted once and the split
        is uploaded to the device once."""
        if not hasattr(self, "_val_nll"):
            from tpuflow.eval.rollout import make_nll_eval

            val_data = load_dataset(
                self.cfg.data, self.cfg.model, "test", norm=self.dataset.norm
            )
            self._val_norm = val_data.norm
            self._val_lf = jnp.asarray(val_data.lf)
            self._val_hf = jnp.asarray(val_data.hf)
            self._val_nll = jax.jit(make_nll_eval(self.model))
            self._val_logger = MetricsLogger(
                f"{self.cfg.train.checkpoint_dir}/{self.cfg.name}/val_log.csv"
            )
        # Keep the supervisor heartbeat alive for the whole validation,
        # including the (possibly many-minutes, remote-compiled) FIRST
        # compile — validation is progress, not a stall, and a single
        # pre-touch cannot outlast a compile longer than stall_timeout.
        import threading

        stop = threading.Event()

        def _tick():
            while not stop.wait(60.0):
                self.logger.touch()

        ticker = threading.Thread(target=_tick, daemon=True)
        self.logger.touch()
        ticker.start()
        try:
            bpds = self._val_nll(self.variables, self._val_lf, self._val_hf)
            val = float(jnp.mean(bpds))
        finally:
            stop.set()
            ticker.join()
        self._val_logger.log(self.global_step, epoch=self.epoch, val_bpd=val)
        return val

    def _plot_sample(self) -> None:
        """Periodic sample figure during training (reference behaviour:
        sample the model on a training LF frame, plot vs HF target)."""
        from tpuflow.eval.plots import plot_prediction_panels

        cfg = self.cfg
        lf_b, hf_b = next(self.dataset.traj_batches(cfg.data.seed, cfg.data.batch_size))
        state = init_lstm_state(cfg.model, (cfg.data.batch_size,))
        x, _ = self.model.apply(
            self.variables, jnp.asarray(lf_b[:, 0]), state,
            jax.random.PRNGKey(self.epoch), 0.7, method=TMGlow.sample_step,
        )
        out_dir = f"{cfg.train.checkpoint_dir}/{cfg.name}/train_plots"
        plot_prediction_panels(
            out_dir, lf_b[0, 0], hf_b[0, 0], np.asarray(x[0]),
            np.zeros_like(hf_b[0, 0]), t=self.epoch,
        )

    def save(self) -> None:
        self.ckpt.save(
            self.epoch,
            {
                "params": self.params,
                "buffers": self.buffers,
                "opt_state": self.opt_state,
                "norm": self.dataset.norm.to_dict(),
            },
            meta={
                "epoch": self.epoch,
                "global_step": self.global_step,
                "config": dataclasses.asdict(self.cfg),
            },
        )

    @property
    def variables(self) -> dict:
        return {"params": self.params, "buffers": self.buffers}
