"""Orbax checkpointing: save/resume of the full training state.

Parity: SURVEY.md §5 "Checkpoint / resume" — the reference torch.saves
model+optimizer state dicts, epoch-tagged, with manual resume. Here the
checkpoint is the complete deterministic-resume tuple: params, buffers,
optimizer state, epoch/step counters, the case config, and the dataset
normalization constants (so a restored model maps physical units
identically). Arrays go through Orbax/tensorstore; non-array metadata
(config dict, counters) is a JSON item in the same step directory.
"""

from __future__ import annotations

import pathlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def abstract_checkpoint_target(
    model, optimizer, model_cfg, batch_size: int = 1
) -> dict[str, Any]:
    """Shape-only image of the saved state tree (the single source of
    truth for the checkpoint contract: params / buffers / opt_state /
    norm). Built via eval_shape from config alone — no FLOPs, no device
    memory, and deliberately no data access (a streaming dataset must
    not pay its normalization sweep just to restore a checkpoint that
    already stores the constants). Orbax needs this to reconstruct
    custom pytree nodes (optax NamedTuples) on restore; both the
    trainer's resume and eval-time loading restore against it.
    """
    from tpuflow.models.tmglow import init_lstm_state

    c = model_cfg.channels
    hf_s = jax.ShapeDtypeStruct(
        (batch_size, *model_cfg.hf_shape, c), jnp.float32
    )
    lf_s = jax.ShapeDtypeStruct(
        (batch_size, *model_cfg.lf_shape, c), jnp.float32
    )
    state = init_lstm_state(model_cfg, (batch_size,))
    variables = jax.eval_shape(
        lambda h, l, s: model.init(jax.random.PRNGKey(0), h, l, s),
        hf_s, lf_s, state,
    )
    norm_s = jax.ShapeDtypeStruct((c,), jnp.float32)
    return {
        "params": variables["params"],
        "buffers": variables.get("buffers", {}),
        "opt_state": jax.eval_shape(optimizer.init, variables["params"]),
        "norm": {
            k: norm_s for k in ("lf_mean", "lf_std", "hf_mean", "hf_std")
        },
    }


class Checkpointer:
    """Thin typed wrapper over ocp.CheckpointManager.

    Layout per step: {state: array pytree, meta: JSON dict}.
    """

    def __init__(self, directory: str | pathlib.Path, max_to_keep: int = 3):
        self._dir = pathlib.Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
            item_names=("state", "meta"),
        )

    def save(
        self,
        step: int,
        state: dict[str, Any],
        meta: dict[str, Any] | None = None,
        force: bool = False,
    ) -> None:
        """state: array pytree (params/buffers/opt_state/norm);
        meta: JSON-serializable dict (epoch, config, ...)."""
        state = jax.tree.map(np.asarray, state)
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta or {}),
            ),
            force=force,
        )
        self._mgr.wait_until_finished()

    def restore(
        self, step: int | None = None, target: Any | None = None
    ) -> dict[str, Any] | None:
        """Restore {'state': ..., 'meta': ...} for the given (or
        latest) step; None if no checkpoint exists.

        Args:
          target: optional abstract pytree (e.g. from jax.eval_shape)
            matching the saved state — REQUIRED to reconstruct custom
            pytree nodes like optax NamedTuple optimizer states, which
            otherwise come back as plain dicts.
        """
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return {"state": out["state"], "meta": out["meta"]}

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()
