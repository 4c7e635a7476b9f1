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
    key = torch_key
    key = re.sub(r"\.weight$", ".kernel", key)
    key = re.sub(r"\.bias$", ".bias", key)
    return tuple(key.split("."))


def convert_state_dict(
    state_dict: dict[str, "np.ndarray"],
    key_map: Callable[[str], tuple[str, ...] | None] = default_key_map,
) -> dict:
    """torch state_dict (tensors or ndarrays) → nested flax params dict.

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


def _validate_against_model(params: dict, cfg) -> list[str]:
    """Compare converted tree against the model's expected shapes;
    returns a list of mismatch descriptions (empty = exact match)."""
    import jax
    import jax.numpy as jnp

    from tpuflow.models.tmglow import TMGlow, init_lstm_state

    model = TMGlow(cfg.model)
    hf = jnp.zeros((1, *cfg.model.hf_shape, cfg.model.channels))
    lf = jnp.zeros((1, *cfg.model.lf_shape, cfg.model.channels))
    expected = jax.eval_shape(
        lambda h, l, s: model.init(jax.random.PRNGKey(0), h, l, s),
        hf, lf, init_lstm_state(cfg.model, (1,)),
    )["params"]

    problems = []
    flat_exp = dict(
        ("/".join(str(k.key) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(expected)[0]
    )
    flat_got = dict(
        ("/".join(str(k.key) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    )
    for k, v in flat_exp.items():
        if k not in flat_got:
            problems.append(f"missing: {k} {v.shape}")
        elif tuple(flat_got[k].shape) != tuple(v.shape):
            problems.append(
                f"shape mismatch {k}: got {flat_got[k].shape}, want {v.shape}"
            )
    for k in flat_got:
        if k not in flat_exp:
            problems.append(f"unexpected: {k}")
    return problems


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
    params = convert_state_dict(state_dict)
    problems = _validate_against_model(params, cfg)
    if problems:
        print("conversion mismatches (first 20):")
        for p in problems[:20]:
            print(" ", p)
        raise SystemExit(1)

    ckpt = Checkpointer(out_dir)
    ckpt.save(0, {"params": params}, meta={"source": in_path, "epoch": 0})
    print(f"converted {len(state_dict)} tensors -> {out_dir}")


if __name__ == "__main__":
    main()
