"""Procedural multi-fidelity flow fixtures for both benchmark cases.

Parity: stands in for the reference's OpenFOAM-exported LF/HF
trajectory archives (SURVEY.md §2 "Dataset loader", §3.5): the real
data are (u, v, p) fields on structured grids for the backward-facing
step and cylinder-array systems at varying Reynolds number, with an
aligned coarse (LF) and fine (HF) trajectory per run. This module
produces arrays with the same tensor contract — HF (N, T, H, W, 3),
LF (N, T, h, w, 3) — from a cheap analytic vortex-street model so the
whole framework (training, rollout, UQ statistics) runs end-to-end
with no network access.

The multi-fidelity relationship mirrors the physical one, in two
fixture versions selected by ``fixture_version``:

* v1 (default, golden-pinned): the LF field is an average-pooled,
  diffused, amplitude-biased rendering of the HF field — correlated
  but visibly degraded. Spatial + static bias only; NO temporal phase
  error.
* v2: the LF trajectory is a separate coarse-solver *run* of the same
  flow — the vortex system re-simulated with an advection-speed
  deficit and a shedding-frequency drift (so LF phase error GROWS
  linearly over the trajectory, the signature failure mode of coarse
  CFD that TM-Glow exists to correct, arXiv:2006.04731 §1–2), plus a
  sharp spectral truncation of the high wavenumbers (coarse-mesh
  resolution limit) on top of the v1 pooling/diffusion/bias pipeline.
  Same vortex identities and phases as the HF run, so LF stays
  genuinely informative about the HF trajectory — just increasingly
  out of phase, exactly like a real coarse solve.

All generation is vectorized NumPy on host; the arrays are consumed by
the JAX pipeline as device inputs.
"""

from __future__ import annotations

import numpy as np

_CASES = ("backward-step", "cylinder-array")


def _vortex_uv(x, y, cx, cy, strength, radius):
    """Gaussian-core vortex velocity at grid (x, y) for centers along
    leading axes. Shapes broadcast: x,y are (H, W); cx,cy,strength are
    (..., 1, 1)."""
    dx = x - cx
    dy = y - cy
    r2 = dx * dx + dy * dy
    core = strength * np.exp(-r2 / (2.0 * radius * radius))
    return -dy * core, dx * core


def _case_params(case: str, rng: np.random.Generator):
    """Per-trajectory physical parameters (the 'varying Reynolds
    number / geometry' axis of the reference datasets)."""
    if case == "backward-step":
        return {
            "re": rng.uniform(0.8, 1.6),           # advection-speed scale
            "strength": rng.uniform(0.6, 1.2),
            "shed_freq": rng.uniform(0.8, 1.4),
            "n_vortices": 6,
        }
    if case == "cylinder-array":
        return {
            "re": rng.uniform(0.8, 1.6),
            "strength": rng.uniform(0.5, 1.0),
            "shed_freq": rng.uniform(1.0, 1.8),
            "n_rows": 3,
            "n_vortices": 4,
        }
    raise ValueError(f"unknown case {case!r}; known: {_CASES}")


def _vortex_phases(case, params, rng):
    """Draw the per-vortex shedding phases once, so an HF run and its
    v2 LF re-run share vortex identities. Order matches the original
    in-loop draws exactly (v1 bit-compatibility)."""
    n_origins = params.get("n_rows", 1) if case == "cylinder-array" else 1
    spacing = 0.9 / params["shed_freq"]
    return [
        [rng.uniform(0.0, spacing) for _ in range(params["n_vortices"])]
        for _ in range(n_origins)
    ]


def _hf_trajectory(case, params, steps, hf_shape, phases,
                   adv_scale=1.0, freq_scale=1.0):
    h, w = hf_shape
    # Domain: x in [0, 4), y in [0, 1).
    ys, xs = np.meshgrid(
        np.linspace(0.0, 1.0, h, endpoint=False),
        np.linspace(0.0, 4.0, w, endpoint=False),
        indexing="ij",
    )
    t = np.arange(steps, dtype=np.float64)[:, None, None] * 0.05
    u = np.zeros((steps, h, w))
    v = np.zeros((steps, h, w))

    adv = params["re"] * adv_scale
    freq = params["shed_freq"] * freq_scale
    if case == "backward-step":
        # Mean shear: parabolic channel profile downstream of the step.
        step_x, step_y = 0.5, 0.5
        u += adv * 4.0 * ys * (1.0 - ys)
        origins = [(step_x, step_y)]
    else:
        # Uniform inflow past rows of cylinders.
        u += adv * 0.8
        rows = params["n_rows"]
        origins = [(0.6, (r + 0.5) / rows) for r in range(rows)]

    spacing = 0.9 / params["shed_freq"]
    for (ox, oy), origin_phases in zip(origins, phases):
        for k in range(params["n_vortices"]):
            sign = 1.0 if k % 2 == 0 else -1.0
            phase = origin_phases[k]
            # Vortices advect downstream and wrap (statistically
            # stationary wake, like the reference's developed flows).
            # adv/freq carry the coarse-run scale factors: a v2 LF
            # re-run accumulates phase error linearly in t.
            cx = ox + ((adv * t + k * spacing + phase) % (4.0 - ox))
            cy = oy + sign * 0.08 * np.sin(
                2.0 * np.pi * freq * t + k
            )
            du, dv = _vortex_uv(
                xs, ys, cx, cy, sign * params["strength"], 0.28
            )
            u += du
            v += dv

    # Bernoulli-flavoured pressure: p = -1/2 |u|^2, fluctuation part.
    p = -0.5 * (u * u + v * v)
    p -= p.mean(axis=(1, 2), keepdims=True)
    hf = np.stack([u, v, p], axis=-1).astype(np.float32)

    if case == "backward-step":
        # Solid step region: zero velocity (geometry mask).
        mask = (xs < 0.5) & (ys < 0.5)
        hf[:, mask, :2] = 0.0
    return hf


def _degrade_to_lf(hf, lf_shape, rng, spectral_cut=0.0):
    """HF -> LF: average-pool to the coarse grid, diffuse, optionally
    truncate high wavenumbers (v2: coarse-mesh resolution limit), add a
    small smooth bias field (the coarse-solver 'model error')."""
    t, h, w, c = hf.shape
    lh, lw = lf_shape
    fh, fw = h // lh, w // lw
    lf = hf.reshape(t, lh, fh, lw, fw, c).mean(axis=(2, 4))
    # One Jacobi-diffusion sweep (numerical dissipation of the coarse solver).
    pad = np.pad(lf, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    lf = 0.5 * lf + 0.125 * (
        pad[:, :-2, 1:-1] + pad[:, 2:, 1:-1] + pad[:, 1:-1, :-2] + pad[:, 1:-1, 2:]
    )
    # Smooth static bias per trajectory.
    bias = rng.normal(0.0, 0.05, size=(1, lh, lw, c)).astype(np.float32)
    for _ in range(4):
        bp = np.pad(bias, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        bias = 0.25 * (bp[:, :-2, 1:-1] + bp[:, 2:, 1:-1] + bp[:, 1:-1, :-2] + bp[:, 1:-1, 2:])
    lf = lf + bias
    if spectral_cut > 0.0:
        # Sharp isotropic low-pass at spectral_cut * Nyquist, applied
        # to the WHOLE coarse field (solution + model-error bias): a
        # coarse mesh cannot represent the top modes at all, so they
        # are REMOVED, not just damped (v1's diffusion only damps).
        # Per-axis normalization keeps the 4:1 domains isotropic in
        # index space.
        ky = np.fft.fftfreq(lh)[:, None] / 0.5
        kx = np.fft.rfftfreq(lw)[None, :] / 0.5
        mask = (ky * ky + kx * kx) <= spectral_cut * spectral_cut
        spec = np.fft.rfft2(lf, axes=(1, 2))
        lf = np.fft.irfft2(spec * mask[None, :, :, None], s=(lh, lw), axes=(1, 2))
    return lf.astype(np.float32)


def generate_case(
    case: str,
    n_traj: int,
    steps: int,
    hf_shape: tuple[int, int],
    lf_shape: tuple[int, int],
    seed: int = 0,
    fixture_version: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate aligned (LF, HF) trajectory arrays for a benchmark case.

    fixture_version: 1 = spatial degradation only (golden-pinned, bit
    stable); 2 = LF is a coarse re-run with growing temporal phase
    error + spectral truncation (see module docstring). v1 draws are a
    prefix of v2's random stream, so v1 arrays are identical whichever
    version existed when a seed was pinned.

    Returns:
      lf: (n_traj, steps, lh, lw, 3) float32
      hf: (n_traj, steps, H, W, 3) float32
    """
    if case not in _CASES:
        raise ValueError(f"unknown case {case!r}; known: {_CASES}")
    if fixture_version not in (1, 2):
        raise ValueError(f"fixture_version must be 1 or 2, got {fixture_version}")
    root = np.random.default_rng(seed)
    lf_all, hf_all = [], []
    for n in range(n_traj):
        rng = np.random.default_rng(root.integers(0, 2**63 - 1))
        params = _case_params(case, rng)
        phases = _vortex_phases(case, params, rng)
        hf = _hf_trajectory(case, params, steps, hf_shape, phases)
        if fixture_version == 1:
            lf = _degrade_to_lf(hf, lf_shape, rng)
        else:
            # The LF trajectory is a separate coarse-solver run: same
            # vortices/phases, but the solver under-predicts advection
            # speed and drifts in shedding frequency — phase error
            # grows linearly over the trajectory — and its mesh cannot
            # carry the top wavenumbers (sharp spectral truncation).
            adv_scale = rng.uniform(0.82, 0.92)
            freq_scale = rng.uniform(0.90, 0.98)
            lf_src = _hf_trajectory(
                case, params, steps, hf_shape, phases,
                adv_scale=adv_scale, freq_scale=freq_scale,
            )
            lf = _degrade_to_lf(lf_src, lf_shape, rng, spectral_cut=0.6)
        hf_all.append(hf)
        lf_all.append(lf)
    return np.stack(lf_all), np.stack(hf_all)
