"""One-process fine-tune lambda sweep on the chip (one compile, traced
lambdas). For each (lambda_crps, lambda_spec): reset to the source
checkpoint, fine-tune E epochs, report the training-curve endpoints
(bpd/crps/spec/tau). Usage:
  python .r4_ft_sweep.py <case> <source_ckpt_dir> crps1:spec1 crps2:spec2 ...
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

case = sys.argv[1]
src = sys.argv[2]
settings = [
    tuple(float(x) for x in a.split(":"))
    for a in sys.argv[3:]
    if "=" not in a
]
EPOCHS = int(next((a.split("=")[1] for a in sys.argv if a.startswith("epochs=")), "4"))

from tpuflow.cli import parse_args
from tpuflow.data.dataset import load_dataset
from tpuflow.eval.loading import load_eval_bundle
from tpuflow.train.finetune import (
    clipped_tau,
    make_finetune_optimizer,
    make_finetune_trajectory_step,
)

extra = [a for a in sys.argv[3:] if "=" in a and not a.startswith("epochs=")]
cfg = parse_args([case, f"train.checkpoint_dir={src}"] + extra)
ft = cfg.finetune
model, variables, norm, _meta = load_eval_bundle(cfg)
params0, buffers = variables["params"], variables["buffers"]
ds = load_dataset(cfg.data, cfg.model, "train", norm=norm)
b = min(ft.batch_size, ds.n_traj)
L = cfg.model.n_scales
log_tau0 = jnp.log(jnp.full((L,), float(cfg.eval.temperature), jnp.float32))
from tpuflow.train.finetune import _scope_mask
opt = make_finetune_optimizer(
    ft.lr, ft.grad_clip, True,
    scope_mask=(_scope_mask(params0, ft.train_scope)
                if ft.train_scope != "all" else None),
)
from tpuflow.data import generate_case
from tpuflow.train.finetune import converged_log_spectra
ref_steps = max(cfg.eval.ref_steps, cfg.data.train_steps)
_, hf_long = generate_case(
    cfg.data.case, ds.n_traj, ref_steps, cfg.model.hf_shape,
    cfg.model.lf_shape, seed=cfg.data.seed,
    fixture_version=cfg.data.fixture_version,
)
hf_long_n = (hf_long - np.asarray(norm.hf_mean)) / np.asarray(norm.hf_std)
spec_targets = jnp.stack([
    converged_log_spectra(jnp.asarray(hf_long_n[i]))
    for i in range(ds.n_traj)
])
del hf_long, hf_long_n
step = jax.jit(
    make_finetune_trajectory_step(
        model, opt, cfg.data.window, ft.n_members, remat=ft.remat,
    )
)
print(f"# sweep {case}: settings={settings} epochs={EPOCHS} "
      f"members={ft.n_members} batch={b}", flush=True)

order_root = np.random.default_rng(7)
n_batches = -(-ds.n_traj // b)
for lam_c, lam_s, *rest in settings:
    lam_d = rest[0] if rest else 0.0
    opt_params = (params0, log_tau0)
    opt_state = opt.init(opt_params)
    lc, ls = jnp.float32(lam_c), jnp.float32(lam_s)
    ldp = jnp.float32(lam_d)
    t0 = time.monotonic()
    hist = []
    for epoch in range(EPOCHS):
        order = order_root.permutation(ds.n_traj)
        ep = {"bpd": [], "crps": [], "spec": [], "disp": [],
              "grad_norm": [], "skipped_windows": []}
        for bi in range(n_batches):
            idx = order[bi * b: (bi + 1) * b]
            if len(idx) < b:
                idx = np.concatenate([idx, order[: b - len(idx)]])
            opt_params, opt_state, m = step(
                opt_params, buffers, opt_state,
                jnp.asarray(ds.lf[idx]), jnp.asarray(ds.hf[idx]),
                spec_targets[jnp.asarray(idx)],
                jax.random.PRNGKey(epoch * 100 + bi), lc, ls, ldp,
            )
            for k in ep:
                ep[k].append(float(m[k]))
        hist.append({k: float(np.mean(v)) for k, v in ep.items()})
        tau = [round(float(t), 3) for t in np.asarray(m["tau"])]
        print(f"  lam=({lam_c},{lam_s},{lam_d}) ep{epoch}: "
              f"bpd={hist[-1]['bpd']:.3f} crps={hist[-1]['crps']:.4f} "
              f"spec={hist[-1]['spec']:.3f} disp={hist[-1]['disp']:.3f} tau={tau} "
              f"gnorm={hist[-1]['grad_norm']:.2f} "
              f"skip={hist[-1]['skipped_windows']:.0f} "
              f"({time.monotonic()-t0:.0f}s)", flush=True)
print("# sweep done", flush=True)
