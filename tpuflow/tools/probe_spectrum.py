"""Band-wise member-fluctuation spectrum probe (per-scale tau grid).

The r3 cylinder diagnosis (docs/PARITY.md) found 2.3-5.5 decades of
excess mid/high-wavenumber energy in the sampled members vs the HF
reference and ruled out GLOBAL temperature as the fix. This probe
localizes where the excess enters by sweeping PER-SCALE temperatures
(glow.reverse vector tau; scale 0 = the finest split) through ONE
compiled fields-mode rollout and reporting, per setting:

  * spectrum_rel_l2 — the exact evaluate.py metric (Hann-tapered,
    physical-wavenumber bins, log rel-L2 vs the converged ref),
  * band-wise log10(E_model/E_hf) over four upper wavenumber bands,
  * ensemble-mean field rel-L2 (so damping that costs accuracy shows),
  * raw TKE rel-L2 vs the converged temporal reference.

Usage: tpuflow-probe-spectrum <case> [key=value overrides]
Writes rows to <eval.output_dir>/<case>/spectrum_probe.json.
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.eval.stats import energy_spectrum, relative_l2, tke_field


def _tau_grid(base: float, n_scales: int) -> list[tuple[str, list[float]]]:
    """Per-scale tau settings: global sweep endpoints + one-scale-out
    ablations. Scale 0 = finest split (high-k), L-1 = base prior."""
    full = [base] * n_scales
    rows: list[tuple[str, list[float]]] = [
        (f"global_{base}", list(full)),
        ("global_0.0", [0.0] * n_scales),
    ]
    for l in range(n_scales):
        t = list(full)
        t[l] = 0.0
        rows.append((f"scale{l}_0.0", t))
        t2 = list(full)
        t2[l] = 0.3
        rows.append((f"scale{l}_0.3", t2))
    # Fine-scale-only sampling (coarse scales deterministic).
    only_fine = [0.0] * n_scales
    only_fine[0] = base
    rows.append(("only_scale0", only_fine))
    return rows


def band_ratios(
    k: np.ndarray, e_model: np.ndarray, e_ref: np.ndarray, n_bands: int = 4
) -> list[float]:
    """log10(E_model/E_ref) averaged over ``n_bands`` equal upper-half
    wavenumber bands (the r3 diagnosis statistic)."""
    n = len(k)
    lo = n // 2
    edges = np.linspace(lo, n, n_bands + 1).astype(int)
    out = []
    for a, b in zip(edges[:-1], edges[1:]):
        num = float(np.mean(e_model[a:b])) + 1e-30
        den = float(np.mean(e_ref[a:b])) + 1e-30
        out.append(float(np.log10(num / den)))
    return out


def run_probe(cfg, n_members: int = 8, steps: int = 32) -> list[dict]:
    from tpuflow.data.dataset import load_dataset
    from tpuflow.eval.loading import load_eval_bundle
    from tpuflow.eval.rollout import make_ensemble_rollout

    model, variables, norm, ckpt_meta = load_eval_bundle(cfg)
    ds = load_dataset(cfg.data, cfg.model, "test", norm=norm)
    t_cal = min(steps, ds.n_steps)
    L = cfg.model.n_scales

    # Converged reference trajectory (same protocol as evaluate.py).
    if cfg.data.synthetic and cfg.eval.ref_steps > t_cal:
        from tpuflow.data import generate_case

        _, hf_long = generate_case(
            cfg.data.case, ds.n_traj, cfg.eval.ref_steps,
            cfg.model.hf_shape, cfg.model.lf_shape,
            seed=cfg.data.seed + 10_000,
            fixture_version=cfg.data.fixture_version,
        )
        hf_ref = jnp.asarray(hf_long[0])
    else:
        hf_ref = jnp.asarray(ds.denorm_hf(ds.hf[0, :t_cal]))
    hf_short = jnp.asarray(ds.denorm_hf(ds.hf[0, :t_cal]))

    spec_domain = (cfg.data.domain_y, cfg.data.domain_x)
    ref_fluct = hf_ref[..., :2] - hf_ref[..., :2].mean(0, keepdims=True)
    k, e_ref = energy_spectrum(ref_fluct, spec_domain, taper=True)
    tke_ref = tke_field(hf_ref.var(axis=0))

    rollout = jax.jit(
        make_ensemble_rollout(model, n_members, collect="fields")
    )
    lf0 = jnp.asarray(ds.lf[0, :t_cal])

    rows = []
    for name, taus in _tau_grid(cfg.eval.temperature, L):
        f = rollout(
            variables, lf0, jax.random.PRNGKey(0), jnp.asarray(taus)
        )  # (T, N, H, W, C) normalized
        members = jnp.asarray(
            np.moveaxis(ds.denorm_hf(np.asarray(f)), 1, 0)
        )  # (N, T, H, W, C)
        fluct = members[..., :2] - members[..., :2].mean(
            axis=(0, 1), keepdims=True
        )
        _, e_m = energy_spectrum(fluct, spec_domain, taper=True)
        mean = members.mean(axis=0)
        # Pooled (time x ensemble) variance == evaluate.py's
        # total_variance(mean_t, var_t) decomposition.
        tke_pred = tke_field(
            members.reshape(-1, *members.shape[2:]).var(axis=0)
        )
        row = {
            "setting": name,
            "taus": taus,
            "spectrum_rel_l2": float(relative_l2(
                jnp.log(e_m[1:] + 1e-20), jnp.log(e_ref[1:] + 1e-20)
            )),
            "band_log10_ratio": band_ratios(
                np.asarray(k), np.asarray(e_m), np.asarray(e_ref)
            ),
            "field_rel_l2": float(relative_l2(mean, hf_short)),
            "tke_rel_l2_raw": float(relative_l2(tke_pred, tke_ref)),
            "finite_frac": float(np.isfinite(np.asarray(f)).mean()),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main(argv=None) -> list[dict]:
    from tpuflow.cli import parse_args

    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = parse_args(argv)
    rows = run_probe(cfg)
    out_dir = pathlib.Path(cfg.eval.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "spectrum_probe.json"
    path.write_text(json.dumps(rows, indent=1))
    print(f"wrote {path}")
    return rows


if __name__ == "__main__":
    main()


from tpuflow.cli import as_console_script  # noqa: E402

cli = as_console_script(main)
