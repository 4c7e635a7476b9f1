"""PyTorch → tpuflow checkpoint converter.

Parity: SURVEY.md §5 "Checkpoint / resume" — the reference distributes
pretrained ``torch.save`` checkpoints with its datasets; BASELINE
config #1 ("rollout from pretrained checkpoint") needs those weights
loadable here. The reference's exact state-dict key layout was
unverifiable offline (SURVEY.md §7 open-unknown 6), so the converter is
a generic engine: a declarative key-mapping table (regex → tpuflow
parameter path) plus the two universal tensor-layout rules, with the
identity mapping for tpuflow-convention keys built in. When the real
layout becomes visible, parity is one mapping table, not new code.

The output is a COMPLETE tpuflow checkpoint (the same tree the trainer
saves: params / buffers / opt_state / norm + JSON meta), so every
consumer — ``cli.rollout``, ``cli.evaluate``, resume via ``cli.train``
— restores it directly:

  * torch ``state_dict()`` includes registered buffers, and the flow's
    invertible-1x1 fixed factors (permutation P, diagonal signs) are
    buffers, not parameters — they are routed to the ``buffers``
    collection by matching each converted path against the model's own
    variable tree. A dump missing them fails validation loudly rather
    than pairing converted L/U/log_s with freshly-seeded random
    factors (a mathematically different W).
  * optimizer state is initialized fresh (a converted checkpoint
    starts optimization at step 0 — torch Adam moments do not map onto
    optax pytrees).
  * normalization constants come from the torch blob when it carries
    them (a ``norm`` dict of lf/hf mean/std), else are computed from
    the configured dataset exactly as training would.

Layout rules applied automatically:
  * Conv2d weight  (O, I, kH, kW)  →  flax kernel (kH, kW, I, O)
  * Linear weight  (O, I)          →  flax kernel (I, O)

Usage:
  python -m tpuflow.tools.convert_torch <in.pt> <out_dir> <case> [key=value ...]
"""

from __future__ import annotations

import re
import sys
from typing import Callable

import numpy as np


def torch_tensor_to_flax(name: str, array: np.ndarray) -> np.ndarray:
    """Apply the torch→flax layout rule implied by rank + name."""
    if name.endswith("weight") or name.endswith("kernel"):
        if array.ndim == 4:  # Conv2d OIHW -> HWIO
            return np.transpose(array, (2, 3, 1, 0))
        if array.ndim == 2:  # Linear OI -> IO
            return np.transpose(array, (1, 0))
    return array


# Identity mapping: torch modules exported with tpuflow's own naming
# ("glow.scale0_step1.coupling.net.conv_in.weight" etc.).
def default_key_map(torch_key: str) -> tuple[str, ...] | None:
    key = re.sub(r"\.weight$", ".kernel", torch_key)
    return tuple(key.split("."))


def convert_state_dict(
    state_dict: dict[str, "np.ndarray"],
    key_map: Callable[[str], tuple[str, ...] | None] = default_key_map,
) -> dict:
    """torch state_dict (tensors or ndarrays) → nested flax-style dict
    (params and buffers mixed — see ``partition_variables``).

    Keys mapped to None are skipped (e.g. running stats we don't use).
    """
    params: dict = {}
    for tkey, tval in state_dict.items():
        path = key_map(tkey)
        if path is None:
            continue
        arr = np.asarray(
            tval.detach().cpu().numpy() if hasattr(tval, "detach") else tval,
            dtype=np.float32,
        )
        arr = torch_tensor_to_flax(path[-1], arr)
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return params


def _flatten(tree) -> dict[str, "np.ndarray"]:
    import jax

    return dict(
        ("/".join(str(k.key) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    )


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, leaf in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def _expected_flat(cfg) -> tuple[dict, dict]:
    """Flattened shape-only images of the model's (params, buffers)
    collections, built from config alone via eval_shape."""
    import jax
    import jax.numpy as jnp

    from tpuflow.models.tmglow import TMGlow, init_lstm_state

    model = TMGlow(cfg.model)
    hf = jnp.zeros((1, *cfg.model.hf_shape, cfg.model.channels))
    lf = jnp.zeros((1, *cfg.model.lf_shape, cfg.model.channels))
    expected = jax.eval_shape(
        lambda h, l, s: model.init(jax.random.PRNGKey(0), h, l, s),
        hf, lf, init_lstm_state(cfg.model, (1,)),
    )
    return _flatten(expected["params"]), _flatten(expected.get("buffers", {}))


def partition_variables(
    converted: dict, cfg
) -> tuple[dict, dict, list[str]]:
    """Split a converted mixed tree into (params, buffers) by matching
    each path against the model's own variable collections, validating
    shapes. A torch ``state_dict()`` carries parameters AND registered
    buffers flat; the flow's inv-1x1 fixed factors (P, sign_s) are
    buffers and MUST come from the dump — pairing converted L/U/log_s
    with fresh random factors would compose a different W.

    Returns (params, buffers, problems); problems empty = exact match.
    """
    exp_params, exp_buffers = _expected_flat(cfg)
    got = _flatten(converted)

    problems: list[str] = []
    out_p: dict[str, np.ndarray] = {}
    out_b: dict[str, np.ndarray] = {}
    for key, want in list(exp_params.items()) + list(exp_buffers.items()):
        dest = out_p if key in exp_params else out_b
        if key not in got:
            problems.append(f"missing: {key} {want.shape}")
        elif tuple(got[key].shape) != tuple(want.shape):
            problems.append(
                f"shape mismatch {key}: got {got[key].shape}, "
                f"want {want.shape}"
            )
        else:
            dest[key] = got[key]
    for key in got:
        if key not in exp_params and key not in exp_buffers:
            problems.append(f"unexpected: {key}")
    return _unflatten(out_p), _unflatten(out_b), problems


def _norm_stats(blob, cfg):
    """Normalization constants: prefer a ``norm`` dict shipped in the
    torch blob; else compute from the configured dataset exactly as
    training would (same NormStats.from_data path)."""
    from tpuflow.data.dataset import load_dataset

    keys = ("lf_mean", "lf_std", "hf_mean", "hf_std")
    if isinstance(blob, dict) and isinstance(blob.get("norm"), dict):
        return {
            k: np.asarray(blob["norm"][k], dtype=np.float32) for k in keys
        }
    ds = load_dataset(cfg.data, cfg.model, "train")
    return ds.norm.to_dict()


def main(argv=None) -> None:
    import torch

    from tpuflow.cli import parse_args
    from tpuflow.train.checkpoint import Checkpointer

    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    in_path, out_dir = argv[0], argv[1]
    cfg = parse_args(argv[2:])

    blob = torch.load(in_path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    # A flat blob may carry the ``norm`` constants dict alongside the
    # tensors; it is consumed by _norm_stats, not a model tensor.
    state_dict = {k: v for k, v in state_dict.items() if k != "norm"}
    converted = convert_state_dict(state_dict)
    params, buffers, problems = partition_variables(converted, cfg)
    if problems:
        print("conversion mismatches (first 20):")
        for p in problems[:20]:
            print(" ", p)
        raise SystemExit(1)

    # Fresh optimizer state: converted checkpoints restart optimization.
    from tpuflow.train.step import make_optimizer

    opt = make_optimizer(
        cfg.train.lr, cfg.train.lr_decay, cfg.train.grad_clip,
        cfg.train.weight_decay,
    )
    state = {
        "params": params,
        "buffers": buffers,
        "opt_state": opt.init(params),
        "norm": _norm_stats(blob, cfg),
    }
    # Meta matches the trainer's own save layout (trainer.py _save meta)
    # so resume via ``cli.train`` and inspect_checkpoint's config<->state
    # drift check both work on converted checkpoints.
    import dataclasses

    ckpt = Checkpointer(out_dir)
    ckpt.save(
        0,
        state,
        meta={
            "source": in_path,
            "epoch": 0,
            "global_step": 0,
            "config": dataclasses.asdict(cfg),
        },
    )
    print(
        f"converted {len(state_dict)} tensors -> {out_dir} "
        "(full checkpoint: params/buffers/opt_state/norm)"
    )


if __name__ == "__main__":
    main()
