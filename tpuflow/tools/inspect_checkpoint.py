"""Checkpoint inspector: what is in a run directory, and is it sound.

Parity context: the reference distributes pretrained torch checkpoints
alongside its datasets (SURVEY.md §5 "Checkpoint / resume"); tpuflow's
Orbax checkpoints carry the full deterministic-resume tuple (params,
buffers, optimizer state, config, normalization constants). This tool
answers the operational questions without writing a restore script:
which steps exist, what config trained them, how many parameters, are
the values finite, do the shapes still match the model the stored
config builds (catches silently drifted configs before a long run
resumes from an incompatible checkpoint).

Usage:
  python -m tpuflow.tools.inspect_checkpoint <run-dir> [--step=N] [--json]

<run-dir> is a Checkpointer directory, e.g. checkpoints/backward-step.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np


def _tree_summary(tree) -> dict:
    import jax

    leaves = jax.tree.leaves(tree)
    n_params = int(sum(np.size(l) for l in leaves))
    bad = int(sum(np.size(l) - np.isfinite(np.asarray(l)).sum()
                  for l in leaves if np.issubdtype(np.asarray(l).dtype, np.floating)))
    return {
        "leaves": len(leaves),
        "values": n_params,
        "bytes": int(sum(np.asarray(l).nbytes for l in leaves)),
        "non_finite": bad,
    }


def inspect_checkpoint(run_dir: str | pathlib.Path, step: int | None = None) -> dict:
    """Return the inspection record for one checkpoint step."""
    from tpuflow.train.checkpoint import Checkpointer

    run_dir = pathlib.Path(run_dir)
    if not run_dir.is_dir():
        # Do NOT construct a Checkpointer here: it mkdir-s the path, and
        # an inspector must never create the run directory it was asked
        # to look at (a typo would leave a bogus empty run behind).
        return {"path": str(run_dir), "steps": [],
                "errors": ["run directory does not exist"], "ok": False}
    steps = sorted(
        int(p.name) for p in run_dir.iterdir()
        if p.is_dir() and p.name.isdigit()
    )
    ckpt = Checkpointer(run_dir)
    try:
        out = ckpt.restore(step)  # latest if step None; plain-dict pytrees
    except Exception as e:  # corrupted saves must report, not crash
        return {"path": str(run_dir), "steps": steps,
                "errors": [f"restore failed: {type(e).__name__}: {e}"],
                "ok": False}
    finally:
        ckpt.close()
    if out is None:
        return {"path": str(run_dir), "steps": steps, "errors": ["no checkpoint found"],
                "ok": False}

    state, meta = out["state"], out["meta"]
    rec: dict = {
        "path": str(run_dir),
        "steps": steps,
        "step": step if step is not None else (steps[-1] if steps else None),
        "epoch": meta.get("epoch"),
        "global_step": meta.get("global_step"),
        "case": (meta.get("config") or {}).get("name"),
        "errors": [],
    }
    for part in ("params", "buffers", "opt_state", "norm"):
        if part in state:
            rec[part] = _tree_summary(state[part])
            if rec[part]["non_finite"]:
                rec["errors"].append(
                    f"{part} contains {rec[part]['non_finite']} non-finite values"
                )
        else:
            rec["errors"].append(f"state is missing '{part}'")
    if "norm" in state:
        rec["norm_constants"] = {
            k: [round(float(x), 6) for x in np.asarray(v)]
            for k, v in state["norm"].items()
        }

    # Config<->state consistency: rebuild the abstract target from the
    # STORED config and compare shapes leaf by leaf.
    cfg_dict = meta.get("config")
    if cfg_dict:
        try:
            import jax

            from tpuflow.configs.config import CaseConfig, _from_dict
            from tpuflow.models import TMGlow
            from tpuflow.train.checkpoint import abstract_checkpoint_target
            from tpuflow.train.step import make_optimizer

            cfg = _from_dict(CaseConfig, cfg_dict)
            target = abstract_checkpoint_target(
                TMGlow(cfg.model),
                make_optimizer(cfg.train.lr, cfg.train.lr_decay, cfg.train.grad_clip),
                cfg.model,
            )
            for part in ("params", "buffers", "norm"):
                want = {
                    jax.tree_util.keystr(p): tuple(l.shape)
                    for p, l in jax.tree_util.tree_flatten_with_path(target[part])[0]
                }
                got = {
                    jax.tree_util.keystr(p): tuple(np.asarray(l).shape)
                    for p, l in jax.tree_util.tree_flatten_with_path(
                        state.get(part, {})
                    )[0]
                }
                for k in sorted(set(want) | set(got)):
                    if k not in got:
                        rec["errors"].append(f"{part}{k}: missing from checkpoint")
                    elif k not in want:
                        rec["errors"].append(f"{part}{k}: not in model built from stored config")
                    elif want[k] != got[k]:
                        rec["errors"].append(
                            f"{part}{k}: shape {got[k]} != model {want[k]}"
                        )
        except Exception as e:  # inspection must report, not crash
            rec["errors"].append(f"config-consistency check failed: {e}")

    rec["ok"] = not rec["errors"]
    return rec


def _fmt(rec: dict) -> str:
    lines = [f"checkpoint dir: {rec['path']}"]
    lines.append(f"  steps on disk: {rec.get('steps')}")
    if "epoch" in rec:
        lines.append(
            f"  inspected step {rec.get('step')}: epoch {rec.get('epoch')}, "
            f"global_step {rec.get('global_step')}, case {rec.get('case')}"
        )
    for part in ("params", "buffers", "opt_state", "norm"):
        if part in rec and isinstance(rec[part], dict) and "values" in rec[part]:
            s = rec[part]
            lines.append(
                f"  {part}: {s['values']:,} values in {s['leaves']} leaves "
                f"({s['bytes'] / 1e6:.1f} MB)"
            )
    if "norm_constants" in rec:
        for k, v in rec["norm_constants"].items():
            lines.append(f"  norm.{k}: {v}")
    for e in rec["errors"]:
        lines.append(f"  ERROR: {e}")
    lines.append("  checkpoint: " + ("OK" if rec["ok"] else "UNSOUND"))
    return "\n".join(lines)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    step, as_json, paths = None, False, []
    for a in argv:
        if a.startswith("--step="):
            step = int(a.split("=", 1)[1])
        elif a == "--json":
            as_json = True
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a}")
        else:
            paths.append(a)
    if not paths:
        print(__doc__)
        return 2
    ok = True
    for p in paths:
        rec = inspect_checkpoint(p, step=step)
        print(json.dumps(rec) if as_json else _fmt(rec))
        ok = ok and rec["ok"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
