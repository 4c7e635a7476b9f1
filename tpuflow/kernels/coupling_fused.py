"""Pallas TPU kernel: the ENTIRE affine coupling fused in VMEM.

One kernel call = coupling net (dense-block convs) + affine apply +
logdet, per GlowStep coupling. Built for VERDICT r1 item 1 (beat XLA's
22%-MXU conv emitter); the measured outcome — kernel ~= XLA, and WHY —
is documented in docs/PERF_NOTES.md ("Fused-kernel ablation"). Short
version: the im2col/lane-concat formation that feeds K = 9*C_in
matmuls costs about as much as the matmuls it enables, because this
model's 64-wide features half-fill both the 128-lane registers and
the MXU's 128 contraction rows; the kernel and XLA's HWNC emitter sit
at the same hardware floor. The kernel therefore ships as a parity-
proven alternative path (ModelConfig.use_pallas), not the default.

What it does:
  * convs run as dx-grouped matmuls with K = 3*C_in lane-concatenated
    dy-taps (v2; v1 staged a (M, 9*C_in) im2col scratch — same speed,
    see the ablation table).
  * all intermediate feature maps live in VMEM; the only HBM traffic
    is x in / y out / weights (resident across the member-tile grid).
  * the affine apply + logdet reduction fuse into the same kernel, so
    the (scale, shift) tensor never exists in HBM.

The kernel computes the same function class as the XLA dense-block
path in flows/coupling.py (same parameter tree — packing is a reshape)
with ONE numerical upgrade: matmul accumulation is f32 even when the
net dtype is bf16 (XLA's bf16 convs round per-op). Forward and reverse
share the net evaluation, so the invertibility contract is unaffected.

Grid: 1-D over member tiles (TM members per cell, whole spatial plane
per cell — no halo exchange). Scratch: one zero-bordered padded
feature buffer (the SAME-conv padding) reused across layers; with
STAGE_DX an additional (tm, h+2, w, pc) staging buffer holds each
dx-slab behind an aligned DMA copy (v1's (M, 9*C_in) im2col scratch
is gone — taps feed the MXU as lane-concatenated slices of the padded
buffer directly).

Gradients: jax.custom_vjp; backward recomputes through the XLA
reference implementation (identical function), so training can use the
fused forward today; a Pallas backward is a follow-up.

Parity oracle + CPU fallback: :func:`xla_reference` (plain NHWC convs,
HIGHEST precision). Property-tested against the kernel in
tests/test_kernels.py, interpret mode on CPU and compiled on TPU (the
bench's pallas section).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SCALE_SHIFT = 2.0  # sigmoid(raw + 2): coupling starts near identity
LANE = 128

# Flip in tests to run the kernel on CPU via the Pallas interpreter.
INTERPRET = False

# Stage each dx-slab of the padded buffer into an aligned scratch
# (ref-to-ref copy; the DMA absorbs the sublane offset) before the
# dy-concat, instead of concatenating sublane-offset slices directly.
# A/B'd on-chip; see docs/PERF_NOTES.md.
STAGE_DX = False

# Perf-ablation switches (dev-only, wrong math when set): used by the
# on-chip probe (tools/ablate_fused.py) to attribute kernel time to
# components. Never set in production paths.
ABLATE: frozenset = frozenset()

# NOTE on both switches: they are threaded into the kernel's static
# config at fused_coupling CALL time (so they participate in _fused's
# nondiff-arg identity), but a CALLER'S jit that traced fused_coupling
# earlier will not retrace when they change — flip them only in a
# fresh probe process (or jax.clear_caches() first). ABLATE produces
# deliberately wrong math and must never be set in a serving process.

# Per-cell VMEM working-set target (bytes) used to pick the member-tile
# size TM. Conservative: v5e VMEM is ~16 MB minus double-buffered
# in/out blocks.
_VMEM_TARGET = 9 * 1024 * 1024


def _taps():
    return [(dy, dx) for dy in range(3) for dx in range(3)]


def _pick_tm(b: int, h: int, w: int, pc: int, net_bytes: int,
             total_out: int, stage_dx: bool = False) -> int:
    """Largest divisor of b whose per-cell working set fits the VMEM
    target.

    v2 working set (no im2col staging buffer — taps feed the MXU as
    lane-concatenated values): padded feature buffer in net dtype, plus
    the live f32 values Mosaic keeps resident per position — the target
    accumulators (``total_out``), one in-flight joint output, the h0
    activation, and ~2 group-concat temporaries of 128 lanes in net
    dtype; with ``stage_dx`` also the (tm, h+2, w, pc) staging scratch.
    Calibrated on-chip (tm=4 at the flagship scale-0 shape compiles
    with ~5 MB headroom; tm=8 overflows).
    """
    per_member = (
        (h + 2) * (w + 2) * pc * net_bytes
        + h * w * (2 * total_out + pc) * 4
        + h * w * 2 * 128 * net_bytes
    )
    if stage_dx:
        per_member += (h + 2) * w * pc * net_bytes
    tm = max(1, _VMEM_TARGET // max(per_member, 1))
    tm = min(tm, b)
    while b % tm:
        tm -= 1
    return tm


def _kernel(
    xa_ref,
    xb_ref,
    h0c_ref,
    win0_ref,
    b0_ref,
    *rest,
    cfg: dict,
):
    """One member-tile: dense-block net on xb (+cond) -> affine on xa."""
    L = cfg["layers"]
    wj_refs = rest[:L + 1]
    bj0_ref = rest[L + 1]
    y_ref, ld_ref = rest[L + 2], rest[L + 3]
    p_ref = rest[L + 4]
    s_ref = rest[L + 5] if cfg["stage_dx"] else None

    tm, h, w, ca = xa_ref.shape
    cb = xb_ref.shape[-1]
    width, growth = cfg["width"], cfg["growth"]
    nd = cfg["net_dtype"]
    reverse = cfg["reverse"]
    ablate = cfg["ablate"]
    m = tm * h * w
    tgt_widths = [growth] * L + [2 * ca]

    # f32 matmuls need full precision (the <1e-4 invertibility gate).
    # Mosaic rejects an explicit fp32 contract precision on bf16
    # operands, so only pin it for f32 (bf16 already accumulates f32
    # via preferred_element_type).
    hp = jax.lax.Precision.HIGHEST if nd == jnp.float32 else None

    # Zero once: the 1-px border is the SAME-conv zero padding; the
    # interior is overwritten before every read. (Measured negligible:
    # the padded buffer is ~1 MB/cell at tm=4.)
    p_ref[...] = jnp.zeros(p_ref.shape, p_ref.dtype)

    def put(fmap_2d, cin, first=False):
        if "no_put" in ablate and not first:
            return
        if "aligned_put" in ablate:
            p_ref[:, 1:h + 1, 0:w, :cin] = fmap_2d.reshape(tm, h, w, cin)
            return
        p_ref[:, 1:h + 1, 1:w + 1, :cin] = fmap_2d.reshape(tm, h, w, cin)

    def conv(cin, w_ref):
        """3x3 SAME conv on p_ref[..., :cin] as 3 dx-grouped matmuls.

        v2 scheme (the r2 perf fix): instead of staging a (M, 9*cin)
        im2col buffer — whose half-lane-tile writes RMW'd and whose
        VMEM footprint forced TM=1 (64 grid cells/coupling, per-cell
        overhead dominated) — feed the MXU with lane-CONCATENATED tap
        values: one matmul per dx with the 3 dy-taps concatenated, so
        the main matmuls contract over 3*cin rows and nothing
        round-trips VMEM. Taps must share a dx within a concat: the w
        dim is the sublane dim, and Mosaic rejects concats whose inputs
        carry different sublane offsets; dy only shifts the untiled h
        dim. Weights arrive dx-major (repacked in _fused_pallas).
        """
        acc = None
        for dx in range(3):
            rdx = 0 if "aligned_reads" in ablate else dx
            if s_ref is not None:
                s_ref[:, :, :, :cin] = p_ref[:, :, rdx:rdx + w, :cin]
                vals = [s_ref[:, dy:dy + h, :, :cin] for dy in range(3)]
            else:
                vals = [p_ref[:, dy:dy + h, rdx:rdx + w, :cin]
                        for dy in range(3)]
            lhs = jnp.concatenate(vals, -1).reshape(m, 3 * cin)
            if "no_matmul" in ablate:
                nout = w_ref.shape[-1]
                part = lhs[:, :nout].astype(jnp.float32) if 3 * cin >= nout \
                    else jnp.zeros((m, nout), jnp.float32)
            else:
                part = jax.lax.dot_general(
                    lhs, w_ref[dx * 3 * cin:(dx + 1) * 3 * cin, :],
                    (((1,), (0,)), ((), ())),
                    precision=hp,
                    preferred_element_type=jnp.float32,
                )
            acc = part if acc is None else acc + part
        return acc

    # conv_in: x-source conv + cond contribution (precomputed outside,
    # batch-1 aware) + bias, then relu.
    xb_val = xb_ref[...].reshape(m, cb)
    put(xb_val.astype(nd), cb, first=True)
    h0 = conv(cb, win0_ref)
    h0c = h0c_ref[...].astype(jnp.float32)
    tmc = h0c.shape[0]
    h0c = h0c.reshape(tmc * h * w, width)
    if tmc != tm:  # batch-1 cond broadcast across the member tile
        h0c = jnp.broadcast_to(h0c.reshape(1, h * w, width), (tm, h * w, width))
        h0c = h0c.reshape(m, width)
    h0 = h0 + h0c + b0_ref[...].reshape(1, width)
    put(jax.nn.relu(h0).astype(nd), width)

    # Joint per-source convs (see flows/coupling.py DenseBlockNet):
    # source j emits its contribution to every later target in one
    # matmul; target t accumulates across sources.
    accs: list = [None] * (L + 1)
    for j in range(L + 1):
        cin = width if j == 0 else growth
        yj = conv(cin, wj_refs[j])
        if j == 0:
            yj = yj + bj0_ref[...].reshape(1, -1)
        off = 0
        for t in range(j, L + 1):
            sl = yj[:, off:off + tgt_widths[t]]
            off += tgt_widths[t]
            accs[t] = sl if accs[t] is None else accs[t] + sl
        if j < L:
            put(jax.nn.relu(accs[j]).astype(nd), growth)

    st = accs[L]  # (M, 2*ca) f32
    raw, t_shift = st[:, :ca], st[:, ca:]
    log_s = jax.nn.log_sigmoid(raw + _SCALE_SHIFT)
    xa_val = xa_ref[...].reshape(m, ca).astype(jnp.float32)
    if reverse:
        ya = xa_val * jnp.exp(-log_s) - t_shift
    else:
        ya = (xa_val + t_shift) * jnp.exp(log_s)
    y_ref[:, :, :, :ca] = ya.reshape(tm, h, w, ca)
    y_ref[:, :, :, ca:] = xb_val.astype(jnp.float32).reshape(tm, h, w, cb)

    # Lane-preserving reduction (Mosaic rejects reshapes that fold the
    # lane dim): sum lanes first, then split the sublane dim by member.
    row_sums = jnp.sum(log_s, axis=1, keepdims=True)  # (M, 1)
    ld = jnp.sum(row_sums.reshape(tm, h * w, 1), axis=1)  # (tm, 1)
    if reverse:
        ld = -ld
    ld_ref[...] = jnp.broadcast_to(ld.reshape(1, tm, 1), ld_ref.shape)


def _fused_pallas(xa, xb, h0c, win0, b0, wjs, bj0, cfg: dict):
    """Launch over (B // TM) member tiles. All inputs pre-flattened:
    xa (B,H,W,ca) f32, xb (B,H,W,cb) f32, h0c (Bc,H,W,width) net dtype,
    weights packed (9*Cin, Cout) net dtype, biases f32 2-D."""
    b, h, w, ca = xa.shape
    cb = xb.shape[-1]
    bc = h0c.shape[0]
    width, growth, L = cfg["width"], cfg["growth"], cfg["layers"]
    nd = cfg["net_dtype"]
    pc = max(cb, width, growth)
    net_bytes = jnp.dtype(nd).itemsize
    total_out = L * growth + 2 * ca
    tm = _pick_tm(b, h, w, pc, net_bytes, total_out, cfg["stage_dx"])
    grid = (b // tm,)

    def dx_major(wp, cin):
        # Repack tap-row blocks (dy-major, _taps() order) into the
        # dx-major order the kernel's dy-concat groups consume.
        blocks = wp.reshape(3, 3, cin, wp.shape[-1])  # (dy, dx, cin, out)
        return jnp.swapaxes(blocks, 0, 1).reshape(9 * cin, wp.shape[-1])

    win0 = dx_major(win0, cb)
    wjs = tuple(
        dx_major(wj, width if j == 0 else growth)
        for j, wj in enumerate(wjs)
    )

    def tile(i):
        return (i, 0, 0, 0)

    def cond_tile(i):
        return (0 if bc == 1 else i, 0, 0, 0)

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((tm, h, w, ca), tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, h, w, cb), tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((tm if bc != 1 else 1, h, w, width), cond_tile,
                     memory_space=pltpu.VMEM),
        full(*win0.shape),
        full(*b0.shape),
        *[full(*wj.shape) for wj in wjs],
        full(*bj0.shape),
    ]
    # ld block keeps the member tile in its OWN trailing dims (1, TM,
    # LANE) so the block always equals the array's last two dims —
    # Mosaic requires trailing block dims divisible by (8, 128) or
    # full, and TM is free to be any divisor of B.
    out_specs = (
        pl.BlockSpec((tm, h, w, ca + cb), tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm, LANE), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    y, ld = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, ca + cb), jnp.float32),
            jax.ShapeDtypeStruct((b // tm, tm, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tm, h + 2, w + 2, pc), nd),
        ] + ([pltpu.VMEM((tm, h + 2, w, pc), nd)] if cfg["stage_dx"] else []),
        interpret=INTERPRET,
    )(xa, xb, h0c, win0, b0, *wjs, bj0)
    return y, ld.reshape(b, LANE)[:, 0]


def xla_reference(xa, xb, h0c, win0, b0, wjs, bj0, cfg: dict):
    """Same function in plain XLA (NHWC convs, HIGHEST precision, f32
    accumulation like the kernel). Used as the custom_vjp backward
    (recompute), the non-TPU fallback, and the parity oracle."""
    L, width, growth = cfg["layers"], cfg["width"], cfg["growth"]
    nd = cfg["net_dtype"]
    reverse = cfg["reverse"]
    ca = xa.shape[-1]
    cb = xb.shape[-1]
    hp = jax.lax.Precision.HIGHEST
    tgt_widths = [growth] * L + [2 * ca]

    def conv(p, w_packed, cin):
        k = w_packed.reshape(3, 3, cin, w_packed.shape[-1])
        out = jax.lax.conv_general_dilated(
            p.astype(nd), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=hp,
            preferred_element_type=jnp.float32,
        )
        return out

    h0 = conv(xb, win0, cb) + b0.reshape(1, 1, 1, width)
    h0 = h0 + h0c.astype(jnp.float32)  # broadcasts batch-1 cond
    feat = jax.nn.relu(h0)

    accs: list = [None] * (L + 1)
    for j in range(L + 1):
        cin = width if j == 0 else growth
        yj = conv(feat, wjs[j], cin)
        if j == 0:
            yj = yj + bj0.reshape(1, 1, 1, -1)
        off = 0
        for t in range(j, L + 1):
            sl = yj[..., off:off + tgt_widths[t]]
            off += tgt_widths[t]
            accs[t] = sl if accs[t] is None else accs[t] + sl
        if j < L:
            feat = jax.nn.relu(accs[j])

    st = accs[L]
    raw, t_shift = st[..., :ca], st[..., ca:]
    log_s = jax.nn.log_sigmoid(raw + _SCALE_SHIFT)
    xa32 = xa.astype(jnp.float32)
    if reverse:
        ya = xa32 * jnp.exp(-log_s) - t_shift
    else:
        ya = (xa32 + t_shift) * jnp.exp(log_s)
    y = jnp.concatenate([ya, xb.astype(jnp.float32)], axis=-1)
    ld = jnp.sum(log_s, axis=(-3, -2, -1))
    return y, (-ld if reverse else ld)


# cfg rides as a hashable static argument: custom_vjp needs nondiff
# args hashable, pallas needs the dict — convert at the boundary. The
# dev switches (stage_dx, ablate) are explicit parameters so they are
# part of _fused's nondiff-arg identity (ADVICE r2: module globals
# read at trace time silently ran stale compiled code).
def _cfg(width, growth, layers, net_dtype, reverse,
         stage_dx=False, ablate=frozenset()):
    return {
        "width": width,
        "growth": growth,
        "layers": layers,
        "net_dtype": net_dtype,
        "reverse": reverse,
        "stage_dx": stage_dx,
        "ablate": ablate,
    }


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13)
)
def _fused(xa, xb, h0c, win0, b0, wjs, bj0,
           width, growth, layers, net_dtype, reverse, stage_dx, ablate):
    return _fused_pallas(
        xa, xb, h0c, win0, b0, wjs, bj0,
        _cfg(width, growth, layers, net_dtype, reverse, stage_dx, ablate),
    )


def _fused_fwd(xa, xb, h0c, win0, b0, wjs, bj0,
               width, growth, layers, net_dtype, reverse, stage_dx, ablate):
    out = _fused(xa, xb, h0c, win0, b0, wjs, bj0,
                 width, growth, layers, net_dtype, reverse, stage_dx, ablate)
    return out, (xa, xb, h0c, win0, b0, wjs, bj0)


def _fused_bwd(width, growth, layers, net_dtype, reverse, stage_dx,
               ablate, res, cts):
    """Backward = differentiate the XLA reference (same function).
    Recompute costs one forward; a Pallas backward is a follow-up."""
    xa, xb, h0c, win0, b0, wjs, bj0 = res
    cfg = _cfg(width, growth, layers, net_dtype, reverse)

    def ref(*args):
        return xla_reference(*args, cfg)

    _, vjp = jax.vjp(ref, xa, xb, h0c, win0, b0, wjs, bj0)
    return vjp(cts)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_available() -> bool:
    return INTERPRET or jax.default_backend() == "tpu"


def fused_coupling(
    xa: jax.Array,
    xb: jax.Array,
    h0c: jax.Array | None,
    win0: jax.Array,
    b0: jax.Array,
    wjs: tuple[jax.Array, ...],
    bj0: jax.Array,
    *,
    width: int,
    growth: int,
    layers: int,
    net_dtype: Any,
    reverse: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused coupling: (y = [affine(xa) , xb], logdet).

    Args:
      xa: (..., H, W, ca) transformed half (any leading batch dims).
      xb: (..., H, W, cb) conditioning half (passes through unchanged).
      h0c: (..., H, W, width) precomputed cond-source conv output
        (conv_in_1) with leading batch of 1 or matching xa's, or None.
      win0/b0: packed conv_in_0 (9*cb, width) + bias (width,).
      wjs: packed joint kernels j=0..layers, (9*Cin_j, total_j).
      bj0: joint_0 bias (total_0,).

    Returns (y, logdet) with y = concat([affine(xa), xb], -1) f32 and
    logdet shaped like the leading batch dims (negated for reverse,
    matching coupling_ops conventions).
    """
    lead = xa.shape[:-3]
    h, w, ca = xa.shape[-3:]
    cb = xb.shape[-1]
    b = 1
    for d in lead:
        b *= d
    xa2 = xa.reshape(b, h, w, ca).astype(jnp.float32)
    xb2 = xb.reshape(b, h, w, cb).astype(jnp.float32)
    if h0c is None:
        h0c2 = jnp.zeros((1, h, w, width), net_dtype)
    else:
        bc = 1
        for d in h0c.shape[:-3]:
            bc *= d
        h0c2 = h0c.reshape(bc, h, w, width).astype(net_dtype)
        if bc not in (1, b):
            raise ValueError(f"cond batch {bc} incompatible with x batch {b}")
    b0_2 = b0.reshape(1, -1).astype(jnp.float32)
    bj0_2 = bj0.reshape(1, -1).astype(jnp.float32)
    win0_p = win0.astype(net_dtype)
    wjs_p = tuple(wj.astype(net_dtype) for wj in wjs)

    if fused_available():
        y, ld = _fused(xa2, xb2, h0c2, win0_p, b0_2, wjs_p, bj0_2,
                       width, growth, layers, net_dtype, reverse,
                       STAGE_DX, frozenset(ABLATE))
    else:
        y, ld = xla_reference(
            xa2, xb2, h0c2, win0_p, b0_2, wjs_p, bj0_2,
            _cfg(width, growth, layers, net_dtype, reverse),
        )
    return y.reshape(*lead, h, w, ca + cb), ld.reshape(lead)
