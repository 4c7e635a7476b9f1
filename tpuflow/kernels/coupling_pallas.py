"""Pallas TPU kernel: fused affine-coupling apply + logdet reduction.

The coupling transform is bandwidth-bound elementwise work (sigmoid,
exp, multiply-add over three same-shape operands) fused with a per-
example reduction (logdet). Fusing them into one VMEM-resident kernel
reads x/raw/t from HBM exactly once and emits y plus the per-row logdet
partial — the "Pallas-fused coupling+logdet kernels" mandated by
BASELINE.json; cf. SURVEY.md §2 native-code finding (the reference's
only "native" tier is ATen CUDA under these same ops).

Layout: operands are flattened to (B, D) rows (B = any leading batch
shape, D = H*W*C of the transformed half), padded to (8k, 128k) tiles.
Grid is 1-D over row tiles; each instance keeps its (TILE_B, Dp) block
in VMEM, applies the transform on the VPU, masks the padded tail via a
static-D iota, and writes the row logdet broadcast across one 128-lane
block (sliced to (B,) by the wrapper).

Gradients: the kernel is wrapped in jax.custom_vjp; the backward pass
is closed-form elementwise (XLA fuses it into the surrounding backprop
for free), so training uses the fused forward too.

Contract (matches tpuflow.kernels.coupling_ops._xla_coupling_apply
bit-for-bit up to f32 rounding; property-tested in
tests/test_kernels.py):
    s  = sigmoid(raw + 2)
    fwd: y = (x + t) * s,      ld = sum_D log s
    inv: y = x / s - t,        ld = sum_D log s   (caller negates)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SCALE_SHIFT = 2.0
TILE_B = 8
LANE = 128

# Flip to True (e.g. in tests) to run the kernel on CPU via the Pallas
# interpreter.
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(x_ref, raw_ref, t_ref, y_ref, ld_ref, *, d_actual: int, reverse: bool):
    x = x_ref[:]
    raw = raw_ref[:]
    t = t_ref[:]
    log_s = jax.nn.log_sigmoid(raw + _SCALE_SHIFT)
    # Mask the padded tail so logdet sums exactly D_actual elements.
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    log_s = jnp.where(col < d_actual, log_s, 0.0)
    if reverse:
        y_ref[:] = x * jnp.exp(-log_s) - t
    else:
        y_ref[:] = (x + t) * jnp.exp(log_s)
    ld = jnp.sum(log_s, axis=1, keepdims=True)  # (TILE_B, 1)
    ld_ref[:] = jnp.broadcast_to(ld, ld_ref.shape)


def _pallas_apply_2d(x, raw, t, *, reverse: bool):
    """Core padded 2-D launch: (B, D) f32 -> ((B, D) y, (B,) sum log s)."""
    b, d = x.shape
    bp = _round_up(max(b, 1), TILE_B)
    dp = _round_up(max(d, 1), LANE)
    pad = ((0, bp - b), (0, dp - d))
    xp = jnp.pad(x, pad)
    rawp = jnp.pad(raw, pad)
    tp = jnp.pad(t, pad)

    grid = (bp // TILE_B,)
    row_spec = pl.BlockSpec(
        (TILE_B, dp), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    ld_spec = pl.BlockSpec(
        (TILE_B, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    y, ld = pl.pallas_call(
        functools.partial(_kernel, d_actual=d, reverse=reverse),
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec],
        out_specs=(row_spec, ld_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bp, LANE), jnp.float32),
        ),
        interpret=INTERPRET,
    )(xp, rawp, tp)
    return y[:b, :d], ld[:b, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _coupling_pallas(x, raw, t, reverse: bool):
    batch_shape = x.shape[:-3]
    field_shape = x.shape[-3:]
    d = field_shape[0] * field_shape[1] * field_shape[2]
    x2 = x.reshape(-1, d)
    raw2 = raw.reshape(-1, d)
    t2 = t.reshape(-1, d)
    y2, ld = _pallas_apply_2d(x2, raw2, t2, reverse=reverse)
    y = y2.reshape(batch_shape + field_shape)
    return y, ld.reshape(batch_shape)


def _fwd(x, raw, t, reverse: bool):
    out = _coupling_pallas(x, raw, t, reverse)
    return out, (x, raw, t)


def _bwd(reverse: bool, res, cts):
    """Closed-form elementwise VJP (XLA; fuses into backprop)."""
    x, raw, t = res
    gy, gld = cts
    gld_b = gld.reshape(gld.shape + (1, 1, 1))  # broadcast over (H, W, C)
    s = jax.nn.sigmoid(raw + _SCALE_SHIFT)
    one_m_s = 1.0 - s
    if reverse:
        # y = x / s - t ; ld = sum log s
        gx = gy / s
        gt = -gy
        graw = (-gy * x / s + gld_b) * one_m_s
    else:
        # y = (x + t) * s ; ld = sum log s
        gx = gy * s
        gt = gy * s
        graw = (gy * (x + t) * s + gld_b) * one_m_s
    return gx, graw, gt


_coupling_pallas.defvjp(_fwd, _bwd)


def pallas_coupling_apply(
    x: jax.Array, raw: jax.Array, t: jax.Array, *, reverse: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Fused (y, logdet) with the sign convention of coupling_ops:
    forward returns +sum log s, reverse returns -sum log s."""
    x = x.astype(jnp.float32)
    raw = raw.astype(jnp.float32)
    t = t.astype(jnp.float32)
    y, ld = _coupling_pallas(x, raw, t, reverse)
    return (y, -ld) if reverse else (y, ld)
