"""Squeeze / unsqueeze — volume-preserving space-to-depth between scales.

Parity: SURVEY.md §2 "Squeeze / unsqueeze" (Glow/RealNVP multi-scale
wiring): H, W halve, C quadruples, logdet = 0.

TPU-first: a pure reshape/transpose; XLA lowers it to a layout change
fused into neighbouring ops, so no kernel is needed. The channel
packing order "(fh fw c)" is identical in both flow layouts
(flows/layout.py), so latents correspond element-for-element across
layouts.
"""

from __future__ import annotations

import jax
from einops import rearrange

from tpuflow.flows.layout import check_layout


def squeeze2d(x: jax.Array, factor: int = 2, layout: str = "nhwc") -> jax.Array:
    """nhwc: (…, H, W, C) -> (…, H/f, W/f, C*f*f);
    hwnc: (H, W, N, C) -> (H/f, W/f, N, C*f*f)."""
    if check_layout(layout) == "hwnc":
        return rearrange(
            x, "(h fh) (w fw) n c -> h w n (fh fw c)", fh=factor, fw=factor
        )
    return rearrange(
        x, "... (h fh) (w fw) c -> ... h w (fh fw c)", fh=factor, fw=factor
    )


def unsqueeze2d(x: jax.Array, factor: int = 2, layout: str = "nhwc") -> jax.Array:
    """Exact inverse of :func:`squeeze2d`."""
    if check_layout(layout) == "hwnc":
        return rearrange(
            x, "h w n (fh fw c) -> (h fh) (w fw) n c", fh=factor, fw=factor
        )
    return rearrange(
        x, "... h w (fh fw c) -> ... (h fh) (w fw) c", fh=factor, fw=factor
    )
