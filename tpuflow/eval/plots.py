"""Field-plot figures matching the reference's evaluation outputs.

Parity: SURVEY.md §2 "Visualization" — contour/field panels of LF
input, HF target, predicted ensemble mean / variance / samples, and
error maps; TKE comparison panels (arXiv:2006.04731 §4 figures).

Matplotlib with the Agg backend (headless); every function writes a
PNG and returns its path.
"""

from __future__ import annotations

import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

_CHANNELS = ("u", "v", "p")


def _panel(ax, field, title, cmap="RdBu_r", vlim=None):
    if vlim is None:
        vmax = float(np.abs(field).max()) or 1.0
        vlim = (-vmax, vmax)
    im = ax.imshow(field, cmap=cmap, vmin=vlim[0], vmax=vlim[1], origin="lower")
    ax.set_title(title, fontsize=9)
    ax.set_xticks([])
    ax.set_yticks([])
    plt.colorbar(im, ax=ax, fraction=0.025)


def plot_prediction_panels(
    out_dir: str | pathlib.Path,
    lf: np.ndarray,        # (h, w, C) LF input at time t
    hf: np.ndarray,        # (H, W, C) HF target at time t
    mean: np.ndarray,      # (H, W, C) ensemble mean
    var: np.ndarray,       # (H, W, C) ensemble variance
    t: int,
    channel: int = 0,
) -> pathlib.Path:
    """LF / HF / mean / variance / error panels for one channel."""
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    name = _CHANNELS[channel]
    fig, axes = plt.subplots(1, 5, figsize=(18, 3.2))
    vmax = float(np.abs(hf[..., channel]).max()) or 1.0
    _panel(axes[0], lf[..., channel], f"LF input {name}", vlim=(-vmax, vmax))
    _panel(axes[1], hf[..., channel], f"HF target {name}", vlim=(-vmax, vmax))
    _panel(axes[2], mean[..., channel], f"pred mean {name}", vlim=(-vmax, vmax))
    _panel(axes[3], var[..., channel], f"pred var {name}", cmap="viridis",
           vlim=(0, float(var[..., channel].max()) or 1.0))
    _panel(axes[4], mean[..., channel] - hf[..., channel], f"error {name}")
    fig.suptitle(f"t={t}", fontsize=10)
    path = out_dir / f"pred_t{t:04d}_{name}.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_tke(
    out_dir: str | pathlib.Path,
    tke_pred: np.ndarray,  # (H, W)
    tke_ref: np.ndarray,   # (H, W)
) -> pathlib.Path:
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    vmax = float(max(tke_ref.max(), tke_pred.max())) or 1.0
    _panel(axes[0], tke_ref, "TKE (HF reference)", cmap="viridis", vlim=(0, vmax))
    _panel(axes[1], tke_pred, "TKE (predicted)", cmap="viridis", vlim=(0, vmax))
    _panel(axes[2], tke_pred - tke_ref, "TKE error")
    path = out_dir / "tke.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_nll_curve(
    out_dir: str | pathlib.Path, bpd_per_step: np.ndarray
) -> pathlib.Path:
    """Held-out bits/dim vs physical time step."""
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 3.2))
    ax.plot(np.asarray(bpd_per_step))
    ax.set_xlabel("timestep")
    ax.set_ylabel("bits/dim")
    ax.grid(alpha=0.3)
    path = out_dir / "nll_curve.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
