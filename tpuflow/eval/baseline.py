"""Trivial-baseline comparator: bicubic LF→HF upsampling.

The reference's claim (arXiv:2006.04731 §1) is that the learned
surrogate beats the *cheap* alternative — just interpolating the
low-fidelity solve onto the fine grid. Every evaluation therefore
reports the bicubic-upsampled LF trajectory on the identical metric
set (rel-L2, TKE, vorticity, spectra, fluctuation W1) side by side
with the model, so model skill over the trivial baseline is a named
number, not an assumption (VERDICT r1 missing-item 5).

The baseline is deterministic (no ensemble): its turbulent fluctuation
statistics come from the time axis only, exactly like the HF
reference's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lf_upsample(
    lf_phys: jnp.ndarray, hf_shape: tuple[int, int], method: str = "cubic"
) -> jnp.ndarray:
    """Bicubic upsampling of a physical-unit LF trajectory to the HF
    grid. lf_phys: (T, lh, lw, C) -> (T, H, W, C)."""
    t, _, _, c = lf_phys.shape
    return jax.image.resize(
        lf_phys, (t, *hf_shape, c), method=method
    ).astype(jnp.float32)


def skill(model_err: float, baseline_err: float) -> float:
    """Skill ratio >1 means the model beats the trivial baseline on
    this (lower-is-better) error metric."""
    return float(baseline_err) / (float(model_err) + 1e-12)
