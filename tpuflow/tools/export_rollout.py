"""Export the ensemble rollout as a portable serving artifact.

Production-serving path beyond the reference's Python-only inference
scripts (SURVEY.md §3.2): `jax.export` lowers the jitted rollout —
checkpoint weights baked in as constants, normalization folded into
the exported graph — to serialized StableHLO that any JAX process can
deserialize and call WITHOUT tpuflow, Flax, or the model code:

    import jax, jax.numpy as jnp
    from jax import export
    # One-line warmup: lowering any LAPACK op in-process registers the
    # CPU custom-call targets (LU solves inside the artifact) — without
    # it, executing a deserialized artifact in a fresh process
    # segfaults on this jaxlib (see load_artifact below).
    jax.jit(jnp.linalg.inv).lower(jnp.eye(2)).compile()
    fn = export.deserialize(pathlib.Path("rollout.jaxexport").read_bytes())
    stats = fn.call(lf_traj, seed, temperature)   # physical-unit mean/var

The artifact is lowered for both TPU and CPU by default, so the same
file serves on-chip and in CPU fallback. Inputs: a normalized LF
trajectory `(T, h, w, C)` float32 and a uint32 scalar PRNG seed;
outputs: the stats-mode rollout dict (ensemble mean/var per step, in
PHYSICAL units — denormalization is exported too).

Usage: python -m tpuflow.tools.export_rollout <case> [key=value ...]
       (out file: {eval.output_dir}/{case}/rollout.jaxexport;
        override with export_path=...)
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from tpuflow.cli import as_console_script, parse_args
from tpuflow.data.dataset import load_dataset
from tpuflow.eval.loading import load_eval_bundle
from tpuflow.eval.rollout import make_ensemble_rollout

# Re-exported for back-compat; the implementation lives in the leaf
# module tools/artifact.py so serving hosts import no model code.
from tpuflow.tools.artifact import load_artifact  # noqa: F401


def build_exported(cfg, model, variables, ds, platforms=("tpu", "cpu")):
    """Lower the stats-mode ensemble rollout to a jax.export Exported.

    The returned artifact computes physical-unit ensemble stats from a
    normalized LF trajectory: weights, ensemble size and the dataset's
    denormalization constants are baked in; the sampling temperature
    tau is a runtime argument (it is already a traced scalar in the
    rollout, so temperature sweeps reuse the one artifact). Call as
    ``fn.call(lf_traj, seed, temperature)``.
    """
    rollout = make_ensemble_rollout(
        model, cfg.eval.n_samples, cfg.eval.temperature, collect="stats"
    )  # tau is a runtime argument below; the closure default is unused
    # Denormalization constants as closed-over arrays: the artifact
    # returns PHYSICAL units (stats.py contract) with no tpuflow code
    # on the serving side.
    hf_sigma = jnp.asarray(ds.norm.hf_std)
    hf_mu = jnp.asarray(ds.norm.hf_mean)

    def serve(lf_traj, seed, temperature):
        out = rollout(
            variables, lf_traj, jax.random.PRNGKey(seed), temperature
        )
        return {
            "mean": out["mean"] * hf_sigma + hf_mu,
            "var": out["var"] * hf_sigma**2,
        }

    t = cfg.eval.rollout_steps
    lf_spec = jax.ShapeDtypeStruct(
        (t, *cfg.model.lf_shape, cfg.model.channels), jnp.float32
    )
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)
    # PER-SCALE tau vector (models/glow.py reverse): a uniform vector
    # reproduces the scalar behavior, and fine-tuned checkpoints deploy
    # their learned_tau through the same input (serve.py broadcasts
    # scalar requests).
    tau_spec = jax.ShapeDtypeStruct((cfg.model.n_scales,), jnp.float32)
    return jax_export.export(jax.jit(serve), platforms=list(platforms))(
        lf_spec, seed_spec, tau_spec
    )




def main(argv=None) -> pathlib.Path:
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    out_override = None
    platforms = ("tpu", "cpu")
    for a in list(argv):
        if a.startswith("export_path="):
            out_override = a.split("=", 1)[1]
            argv.remove(a)
        elif a.startswith("export_platforms="):
            platforms = tuple(a.split("=", 1)[1].split(","))
            argv.remove(a)
    cfg = parse_args(argv)
    model, variables, norm, ckpt_meta = load_eval_bundle(cfg)
    ds = load_dataset(cfg.data, cfg.model, "test", norm=norm)

    from tpuflow.eval.loading import resolve_temperature

    resolved = resolve_temperature(cfg, ckpt_meta)
    default_temperature = (
        [float(resolved)] * cfg.model.n_scales
        if np.ndim(resolved) == 0
        else [float(t) for t in np.asarray(resolved)]
    )
    exp = build_exported(cfg, model, variables, ds, platforms)
    out = (
        pathlib.Path(out_override)
        if out_override
        else pathlib.Path(cfg.eval.output_dir) / cfg.name / "rollout.jaxexport"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    data = exp.serialize()
    out.write_bytes(data)
    # Sidecar metadata: everything a serving process that has ONLY the
    # artifact needs — the input contract (the artifact consumes a
    # NORMALIZED LF trajectory) plus the LF normalization constants to
    # map physical-unit requests into it (tools/serve.py consumes this).
    meta = {
        "case": cfg.name,
        "rollout_steps": cfg.eval.rollout_steps,
        "n_samples": cfg.eval.n_samples,
        "default_temperature": default_temperature,
        "n_scales": cfg.model.n_scales,
        "lf_input_shape": [
            cfg.eval.rollout_steps,
            *cfg.model.lf_shape,
            cfg.model.channels,
        ],
        "platforms": list(platforms),
        "lf_mean": np.asarray(ds.norm.lf_mean, dtype=np.float64).tolist(),
        "lf_std": np.asarray(ds.norm.lf_std, dtype=np.float64).tolist(),
        "outputs": "physical-unit ensemble mean/var per step",
    }
    # Deploy the fitted UQ recalibration with the artifact: if this
    # case has been evaluated, carry the fitted factors (eval/calibrate
    # — mean-preserving spread inflation + per-level interval factors)
    # so the serving side can return calibrated variances/intervals
    # without rerunning evaluation (serve.py `calibrated`).
    metrics_path = (
        pathlib.Path(cfg.eval.output_dir) / cfg.name / "eval_metrics.json"
    )
    if metrics_path.exists():
        m = json.loads(metrics_path.read_text())
        if "spread_scale" in m:
            meta["spread_scale"] = float(m["spread_scale"])
        if "interval_scales" in m:
            meta["interval_scales"] = {
                k: float(v) for k, v in m["interval_scales"].items()
            }
    meta_path = out.with_suffix(".meta.json")
    meta_path.write_text(json.dumps(meta, indent=2) + "\n")
    print(
        f"exported {cfg.eval.rollout_steps}-step {cfg.eval.n_samples}-member "
        f"rollout for {platforms} -> {out} ({len(data) / 1e6:.1f} MB; "
        f"sidecar {meta_path.name})"
    )
    return out


if __name__ == "__main__":
    main()


cli = as_console_script(main)
