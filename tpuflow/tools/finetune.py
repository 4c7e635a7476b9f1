"""Sample-path fine-tune driver (train/finetune.py objectives).

Loads a converged NLL checkpoint, fine-tunes on the composite
NLL + dispersion (fair CRPS) + spectral-shape objective evaluated on
actual generative draws, optionally learning a per-scale sampling
temperature, and saves a NEW checkpoint (source untouched) whose meta
carries the fitted ``learned_tau`` — the eval/rollout/export CLIs
deploy it automatically (eval/loading.resolve_temperature).

Usage:
  python -m tpuflow.tools.finetune <case> \\
      train.checkpoint_dir=<source runs dir> \\
      [finetune.lambda_crps=0.3 finetune.lambda_spec=0.05 ...]

The fine-tuned checkpoint keeps the standard state-tree contract
(params/buffers/opt_state/norm with a FRESH params-only optimizer
state), so every existing consumer — evaluate, rollout, export, the
serving runtime — loads it unchanged.
"""

from __future__ import annotations

import json
import math
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> dict:
    from tpuflow.cli import parse_args
    from tpuflow.data.dataset import load_dataset
    from tpuflow.eval.loading import load_eval_bundle
    from tpuflow.train.checkpoint import Checkpointer
    from tpuflow.train.finetune import (
        clipped_tau,
        make_finetune_optimizer,
        make_finetune_trajectory_step,
    )
    from tpuflow.train.step import make_optimizer

    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = parse_args(argv)
    ft = cfg.finetune

    # Source checkpoint (never overwritten).
    src_cfg = cfg
    if ft.source_dir:
        from tpuflow.configs.config import _apply_overrides

        src_cfg = _apply_overrides(
            cfg, {"train.checkpoint_dir": ft.source_dir}
        )
    model, variables, norm, ckpt_meta = load_eval_bundle(src_cfg)
    if norm is None:
        raise FileNotFoundError(
            "finetune needs a trained source checkpoint (none found)"
        )
    params, buffers = variables["params"], variables["buffers"]

    ds = load_dataset(cfg.data, cfg.model, "train", norm=norm)
    b = min(ft.batch_size, ds.n_traj)

    # Converged-reference log-spectrum targets, one per train
    # trajectory (train/finetune.spectral_target_mse): the SAME
    # trajectories extended to eval.ref_steps, normalized with the
    # checkpoint constants, spectra in normalized space.
    from tpuflow.data import generate_case
    from tpuflow.train.finetune import converged_log_spectra

    ref_steps = max(cfg.eval.ref_steps, cfg.data.train_steps)
    _, hf_long = generate_case(
        cfg.data.case, ds.n_traj, ref_steps,
        cfg.model.hf_shape, cfg.model.lf_shape, seed=cfg.data.seed,
        fixture_version=cfg.data.fixture_version,
    )
    hf_long_n = (hf_long - np.asarray(norm.hf_mean)) / np.asarray(norm.hf_std)
    spec_targets = jnp.stack([
        converged_log_spectra(jnp.asarray(hf_long_n[i]))
        for i in range(ds.n_traj)
    ])  # (n_traj, nbins-1)
    del hf_long, hf_long_n

    # Learned per-scale tau initialized at the source checkpoint's
    # deployed temperature (its own learned_tau when chaining
    # fine-tune stages; the scalar preset otherwise).
    from tpuflow.eval.loading import resolve_temperature

    L = cfg.model.n_scales
    tau0 = resolve_temperature(cfg, ckpt_meta)
    log_tau0 = jnp.log(
        jnp.full((L,), float(tau0), jnp.float32)
        if np.ndim(tau0) == 0 else jnp.asarray(tau0, jnp.float32)
    )
    from tpuflow.train.finetune import _scope_mask

    opt = make_finetune_optimizer(
        ft.lr, ft.grad_clip, ft.learn_tau,
        scope_mask=(
            _scope_mask(params, ft.train_scope)
            if ft.train_scope != "all" else None
        ),
    )
    opt_params = (params, log_tau0)
    opt_state = opt.init(opt_params)

    step = jax.jit(
        make_finetune_trajectory_step(
            model, opt, cfg.data.window, ft.n_members, remat=ft.remat,
        ),
        donate_argnums=(0, 2),
    )
    lam_crps = jnp.float32(ft.lambda_crps)
    lam_spec = jnp.float32(ft.lambda_spec)
    lam_disp = jnp.float32(ft.lambda_disp)

    out_dir = pathlib.Path(
        ft.checkpoint_dir
        or (src_cfg.train.checkpoint_dir.rstrip("/") + "_ft")
    )
    ckpt = Checkpointer(out_dir / cfg.name)
    log_path = out_dir / f"{cfg.name}_finetune_log.csv"
    out_dir.mkdir(parents=True, exist_ok=True)
    log_rows = ["epoch,loss,bpd,crps,spec,disp,tau,seconds,grad_norm,skipped_windows"]

    rng_root = np.random.default_rng(ft.seed)
    n_batches = math.ceil(ds.n_traj / b)
    t_start = time.monotonic()
    metrics = {}
    for epoch in range(ft.epochs):
        t0 = time.monotonic()
        order = rng_root.permutation(ds.n_traj)
        ep = {"loss": [], "bpd": [], "crps": [], "spec": [], "disp": [],
              "grad_norm": [], "skipped_windows": []}
        for bi in range(n_batches):
            idx = order[bi * b: (bi + 1) * b]
            if len(idx) < b:  # static shapes: pad by wrapping
                idx = np.concatenate([idx, order[: b - len(idx)]])
            lf = jnp.asarray(ds.lf[idx])
            hf = jnp.asarray(ds.hf[idx])
            opt_params, opt_state, metrics = step(
                opt_params, buffers, opt_state, lf, hf,
                spec_targets[jnp.asarray(idx)],
                jax.random.PRNGKey(ft.seed + epoch * 1000 + bi),
                lam_crps, lam_spec, lam_disp,
            )
            for k in ep:
                ep[k].append(float(metrics[k]))
        tau_now = [round(float(t), 4) for t in np.asarray(metrics["tau"])]
        row = (
            f"{epoch},{np.mean(ep['loss']):.5f},{np.mean(ep['bpd']):.5f},"
            f"{np.mean(ep['crps']):.5f},{np.mean(ep['spec']):.5f},"
            f"{np.mean(ep['disp']):.5f},"
            f"\"{tau_now}\",{time.monotonic() - t0:.1f},"
            f"{np.mean(ep['grad_norm']):.3f},{np.sum(ep['skipped_windows']):.0f}"
        )
        log_rows.append(row)
        log_path.write_text("\n".join(log_rows) + "\n")
        print(f"[finetune] {row}", flush=True)

    params_ft, log_tau_ft = opt_params
    learned_tau = [float(t) for t in np.asarray(clipped_tau(log_tau_ft))]
    # Standard state-tree contract: fresh params-only optimizer state
    # (the tuple-pytree fine-tune opt state would break the shared
    # abstract_checkpoint_target restore).
    std_opt = make_optimizer(
        cfg.train.lr, cfg.train.lr_decay, cfg.train.grad_clip,
        cfg.train.weight_decay,
    )
    meta = {
        **{k: v for k, v in ckpt_meta.items() if k != "learned_tau"},
        "learned_tau": learned_tau if ft.learn_tau else None,
        "finetune": {
            "epochs": ft.epochs,
            "n_members": ft.n_members,
            "lambda_crps": ft.lambda_crps,
            "lambda_spec": ft.lambda_spec,
            "lambda_disp": ft.lambda_disp,
            "train_scope": ft.train_scope,
            "lr": ft.lr,
            "source_dir": src_cfg.train.checkpoint_dir,
            "final_bpd": float(np.mean(ep["bpd"])),
            "final_crps": float(np.mean(ep["crps"])),
            "final_spec": float(np.mean(ep["spec"])),
            "final_disp": float(np.mean(ep["disp"])),
        },
    }
    if not ft.learn_tau:
        meta.pop("learned_tau")
    ckpt.save(
        ft.epochs,
        {
            "params": params_ft,
            "buffers": buffers,
            "opt_state": std_opt.init(params_ft),
            "norm": norm.to_dict(),
        },
        meta=meta,
    )
    summary = {
        "checkpoint_dir": str(out_dir),
        "learned_tau": learned_tau if ft.learn_tau else None,
        "final_bpd": meta["finetune"]["final_bpd"],
        "final_crps": meta["finetune"]["final_crps"],
        "final_spec": meta["finetune"]["final_spec"],
        "seconds": round(time.monotonic() - t_start, 1),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()


from tpuflow.cli import as_console_script  # noqa: E402

cli = as_console_script(main)
