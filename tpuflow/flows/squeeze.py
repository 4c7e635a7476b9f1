"""Squeeze / unsqueeze — volume-preserving space-to-depth between scales.

Parity: SURVEY.md §2 "Squeeze / unsqueeze" (Glow/RealNVP multi-scale
wiring): (…, H, W, C) -> (…, H/2, W/2, 4C), logdet = 0.

TPU-first: a pure reshape/transpose; XLA lowers it to a layout change
fused into neighbouring ops, so no kernel is needed. NHWC is kept
throughout (TPU-native conv layout).
"""

from __future__ import annotations

import jax
from einops import rearrange


def squeeze2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """(…, H, W, C) -> (…, H/f, W/f, C*f*f)."""
    return rearrange(
        x, "... (h fh) (w fw) c -> ... h w (fh fw c)", fh=factor, fw=factor
    )


def unsqueeze2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Exact inverse of :func:`squeeze2d`."""
    return rearrange(
        x, "... h w (fh fw c) -> ... (h fh) (w fw) c", fh=factor, fw=factor
    )
