"""Sampling-stability probe: where do high-tau rollouts go non-finite?

The measurement tool behind docs/PAPER_PARITY.md "Sampling stability"
(and the r3 `model.z_clip` design): rolls out a small ensemble at a
grid of taus x seeds, with and without truncated latent draws, and
reports the first non-finite step plus the per-step max|y| of the
finite values. The signature that distinguishes the two failure
modes:

  * growing max|y| then overflow -> dynamical divergence through the
    autoregressive loop (state feedback);
  * non-finite pixels appearing while finite pixels stay O(1) ->
    intra-step overflow deep in the reverse coupling cascade,
    laundered to NaN (inf - inf) — the tau >= 1.15 bulk-OOD mode,
    which no sampling-side guard can fix.

Usage:
  python -m tpuflow.tools.probe_tau_stability <case> \
      [taus=1.0,1.15] [clips=0,4] [seeds=3] [key=value ...]

Runs on whatever backend jax selects; force CPU for a chip-free
diagnosis (see tests/conftest.py).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def probe(cfg, taus, z_clip: float, seeds: int) -> list[dict]:
    """One config + z_clip setting; returns per-(tau, seed) rows."""
    import dataclasses

    from tpuflow.data.dataset import load_dataset
    from tpuflow.eval.loading import load_eval_bundle
    from tpuflow.eval.rollout import make_ensemble_rollout

    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, z_clip=z_clip)
    )
    model, variables, norm, ckpt_meta = load_eval_bundle(cfg)
    ds = load_dataset(cfg.data, cfg.model, "test", norm=norm)
    T = min(cfg.eval.rollout_steps, ds.n_steps)
    rollout = jax.jit(
        make_ensemble_rollout(model, cfg.eval.n_samples, collect="fields")
    )
    lf = jnp.asarray(ds.lf[0, :T])
    rows = []
    for tau in taus:
        for seed in range(seeds):
            ys = np.asarray(
                rollout(variables, lf, jax.random.PRNGKey(seed),
                        jnp.float32(tau))
            )
            finite = np.isfinite(ys).all(axis=tuple(range(1, ys.ndim)))
            first_bad = int(np.argmin(finite)) if not finite.all() else -1
            mx = np.nanmax(
                np.abs(np.where(np.isfinite(ys), ys, np.nan)),
                axis=tuple(range(1, ys.ndim)),
            )
            row = {
                "z_clip": z_clip,
                "temperature": float(tau),
                "seed": seed,
                "first_nonfinite_step": first_bad,
                "max_abs_head": [round(float(v), 2) for v in mx[:4]],
                "max_abs_tail": [round(float(v), 2) for v in mx[-4:]],
            }
            rows.append(row)
            print(row, flush=True)
    return rows


def main(argv=None) -> list[dict]:
    from tpuflow.cli import parse_args

    argv = list(sys.argv[1:] if argv is None else argv)
    taus, clips, seeds = (1.0, 1.15), (0.0, 4.0), 3
    for a in list(argv):
        if a.startswith("taus="):
            taus = tuple(float(x) for x in a.split("=", 1)[1].split(","))
            argv.remove(a)
        elif a.startswith("clips="):
            clips = tuple(float(x) for x in a.split("=", 1)[1].split(","))
            argv.remove(a)
        elif a.startswith("seeds="):
            seeds = int(a.split("=", 1)[1])
            argv.remove(a)
    cfg = parse_args(argv)
    rows = []
    for clip in clips:
        rows.extend(probe(cfg, taus, clip, seeds))
    return rows


if __name__ == "__main__":
    main()


from tpuflow.cli import as_console_script

cli = as_console_script(main)
