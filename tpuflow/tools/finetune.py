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
    # Overflow guard state (FinetuneConfig.max_skipped_frac docstring;
    # measured necessity: runs/r5_bstep_ft first attempt). The number
    # of BPTT windows per epoch bounds the skipped-window counter.
    total_windows = n_batches * (ds.lf.shape[1] // cfg.data.window)
    good_snap = None          # (epoch, host copy of opt_params)
    best_healthy_bpd = None   # reference for max_bpd_rise
    bad_streak = 0
    early_stopped = False
    epoch_summaries = {}
    last_epoch_healthy = True
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

        ep_bpd = float(np.mean(ep["bpd"]))
        epoch_summaries[epoch] = {
            "bpd": ep_bpd,
            "crps": float(np.mean(ep["crps"])),
            "spec": float(np.mean(ep["spec"])),
            "disp": float(np.mean(ep["disp"])),
        }
        skip_frac = float(np.sum(ep["skipped_windows"])) / max(
            1, total_windows
        )
        healthy = skip_frac <= ft.max_skipped_frac and (
            best_healthy_bpd is None
            or ep_bpd <= best_healthy_bpd + ft.max_bpd_rise
        )
        last_epoch_healthy = healthy
        if healthy:
            # Host snapshot of the last healthy state: the saved
            # checkpoint rolls back here if later epochs cross the
            # decoder's validity boundary.
            good_snap = (epoch, jax.device_get(opt_params))
            best_healthy_bpd = (
                ep_bpd if best_healthy_bpd is None
                else min(best_healthy_bpd, ep_bpd)
            )
            bad_streak = 0
        else:
            bad_streak += 1
            print(
                f"[finetune] epoch {epoch} UNHEALTHY: skipped-window "
                f"frac {skip_frac:.2f} (max {ft.max_skipped_frac}), "
                f"bpd {ep_bpd:.3f} (best healthy {best_healthy_bpd})",
                flush=True,
            )
            catastrophic = (
                best_healthy_bpd is not None
                and ep_bpd > best_healthy_bpd + 2 * ft.max_bpd_rise
            )
            if ft.early_stop and (bad_streak >= 2 or catastrophic):
                early_stopped = True
                print(
                    "[finetune] overflow boundary crossed — stopping "
                    f"early after epoch {epoch}; saving the last "
                    "healthy snapshot"
                    + (f" (epoch {good_snap[0]})" if good_snap else ""),
                    flush=True,
                )
                break

    params_ft, log_tau_ft = opt_params
    saved_epoch = epoch
    if good_snap is not None and not last_epoch_healthy:
        saved_epoch, (params_ft, log_tau_ft) = good_snap
        print(
            f"[finetune] rolled back to healthy epoch {saved_epoch}",
            flush=True,
        )
    elif good_snap is None:
        print(
            "[finetune] WARNING: no healthy epoch — saving the final "
            "state anyway; inspect the log before deploying",
            flush=True,
        )
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
            # Summary of the epoch actually SAVED (the guard may roll
            # back to the last healthy snapshot).
            "saved_epoch": saved_epoch,
            "epochs_run": epoch + 1,
            "early_stopped": early_stopped,
            "final_bpd": epoch_summaries[saved_epoch]["bpd"],
            "final_crps": epoch_summaries[saved_epoch]["crps"],
            "final_spec": epoch_summaries[saved_epoch]["spec"],
            "final_disp": epoch_summaries[saved_epoch]["disp"],
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
