"""Dispatch layer for the coupling affine apply + logdet reduction.

The affine-coupling *transform* (scale-sigmoid, shift, elementwise
apply, logdet reduction) is the one flow op that is pure
bandwidth-bound elementwise work glued to a reduction — the Pallas
fusion target named by BASELINE.json ("Pallas-fused coupling+logdet
kernels"). The coupling *network* (dense-block convs) stays in XLA
where the MXU conv pipeline is already optimal.

Two implementations:
  * XLA path — the measured DEFAULT on TPU: after the concat-free net
    restructure, XLA fuses the affine+logdet into its neighbours
    in-place, beating the custom call by ~6% whole-model device time
    (1094 vs 1163 ms / 100-step flagship rollout; the kernel's (B, D)
    flatten forces layout copies at the custom-call boundary).
  * Pallas TPU kernel (tpuflow/kernels/coupling_pallas.py) — kept
    available behind ``use_pallas`` and property-tested against the
    XLA path in both directions.

Both compute, for forward:
    s  = sigmoid(raw + 2)          # Glow-official stable scale
    y  = (x + t) * s
    ld = sum over (H, W, C) of log s        # per batch element
and for reverse:
    x  = y / s - t
    ld = -sum log s
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_SCALE_SHIFT = 2.0  # sigmoid(raw + 2): starts near identity (s ~ 0.88)


def _xla_coupling_apply(
    x: jax.Array, raw: jax.Array, t: jax.Array, *, reverse: bool,
    layout: str = "nhwc",
) -> tuple[jax.Array, jax.Array]:
    from tpuflow.flows.layout import field_axes

    x = x.astype(jnp.float32)
    raw = raw.astype(jnp.float32)
    t = t.astype(jnp.float32)
    log_s = jax.nn.log_sigmoid(raw + _SCALE_SHIFT)
    if layout == "hwnc":
        reduce_axes = field_axes("hwnc")
    else:
        reduce_axes = tuple(range(x.ndim - 3, x.ndim))
    logdet = jnp.sum(log_s, axis=reduce_axes)
    if reverse:
        y = x * jnp.exp(-log_s) - t
        return y, -logdet
    y = (x + t) * jnp.exp(log_s)
    return y, logdet


def coupling_apply(
    x: jax.Array,
    raw: jax.Array,
    t: jax.Array,
    *,
    reverse: bool = False,
    use_pallas: bool = False,
    layout: str = "nhwc",
) -> tuple[jax.Array, jax.Array]:
    """Fused affine-coupling apply + logdet.

    Args:
      x: (..., H, W, C) half-channels being transformed (float32 path);
        (H, W, N, C) when ``layout="hwnc"`` (flows/layout.py).
      raw: raw scale logits from the coupling net, same shape.
      t: shift from the coupling net, same shape.
      reverse: inverse transform if True.
      use_pallas: route to the Pallas TPU kernel when on TPU
        (nhwc layout only).
      layout: flow-tensor layout; picks the logdet reduction axes.

    Returns:
      (y, logdet) with logdet shape = batch shape, float32.
    """
    if use_pallas and _on_tpu():
        if layout == "hwnc":
            raise ValueError("the Pallas coupling kernel is nhwc-only")
        from tpuflow.kernels.coupling_pallas import pallas_coupling_apply

        return pallas_coupling_apply(x, raw, t, reverse=reverse)
    return _xla_coupling_apply(x, raw, t, reverse=reverse, layout=layout)


@functools.cache
def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"
