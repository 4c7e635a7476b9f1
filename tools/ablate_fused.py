"""On-chip ablation probe: where does the fused kernel's time go?

Checked-in version of the round-2 probe behind docs/PERF_NOTES.md
"Fused-kernel ablation" (ADVICE r2: the table must be reproducible
from the repository). Also pins the TRUE bar: the model's real bf16
XLA conv path (default precision), not the HIGHEST-precision
xla_reference strawman. Each ablation jits a FRESH closure, so the
call-time ABLATE flip is safe (see coupling_fused.py switch notes).

Run on a chip: python tools/ablate_fused.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.kernels import coupling_fused as cf

B, H, W, CA, CB = 64, 32, 64, 6, 6
WIDTH, GROWTH, L = 64, 32, 3
ND = jnp.bfloat16
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 12)
xa = jax.random.normal(ks[0], (B, H, W, CA), jnp.float32)
xb = jax.random.normal(ks[1], (B, H, W, CB), jnp.float32)
h0c = jax.random.normal(ks[2], (1, H, W, WIDTH), jnp.float32) * 0.1
tgt = [GROWTH] * L + [2 * CA]
win0 = jax.random.normal(ks[3], (9 * CB, WIDTH), jnp.float32) * 0.05
b0 = jnp.zeros((WIDTH,), jnp.float32)
wjs = tuple(
    jax.random.normal(ks[4 + j], (9 * (WIDTH if j == 0 else GROWTH), sum(tgt[j:])), jnp.float32) * 0.05
    for j in range(L + 1))
bj0 = jnp.zeros((sum(tgt),), jnp.float32)


def timeit(fn, n=8, inner=8):
    @jax.jit
    def many(xa_, xb_):
        def body(c, _):
            y, ld = fn(c, xb_)
            return y[..., :CA] + 1e-6 * ld.reshape(-1, 1, 1, 1), None
        out, _ = jax.lax.scan(body, xa_, None, length=inner)
        return out
    t0 = time.perf_counter()
    many(xa, xb).block_until_ready()
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        many(xa, xb).block_until_ready()
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts) * 1e6), comp


def fused(xa_, xb_):
    return cf.fused_coupling(
        xa_, xb_, h0c, win0, b0, wjs, bj0,
        width=WIDTH, growth=GROWTH, layers=L, net_dtype=ND, reverse=False)


def xla_bf16(xa_, xb_):
    """The model's real conv path: bf16 convs, default precision."""
    def conv(p, w_packed, cin):
        k = w_packed.reshape(3, 3, cin, w_packed.shape[-1]).astype(ND)
        return jax.lax.conv_general_dilated(
            p.astype(ND), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    h0 = conv(xb_, win0, CB) + b0.reshape(1, 1, 1, WIDTH)
    h0 = h0 + h0c
    feat = jax.nn.relu(h0)
    accs = [None] * (L + 1)
    for j in range(L + 1):
        cin = WIDTH if j == 0 else GROWTH
        yj = conv(feat, wjs[j], cin)
        if j == 0:
            yj = yj + bj0.reshape(1, 1, 1, -1)
        off = 0
        for t in range(j, L + 1):
            sl = yj[..., off:off + tgt[t]]
            off += tgt[t]
            accs[t] = sl if accs[t] is None else accs[t] + sl
        if j < L:
            feat = jax.nn.relu(accs[j])
    st = accs[L]
    raw, t_shift = st[..., :CA], st[..., CA:]
    log_s = jax.nn.log_sigmoid(raw + 2.0)
    ya = (xa_ + t_shift) * jnp.exp(log_s)
    y = jnp.concatenate([ya, xb_], axis=-1)
    return y, jnp.sum(log_s, axis=(-3, -2, -1))


print("backend:", jax.default_backend(), flush=True)
us, comp = timeit(xla_bf16)
print(f"XLA bf16 TRUE bar     : {us:8.1f} us/coupling (compile {comp:.0f}s)", flush=True)

for name, abl in [
    ("full v2 tm=2", set()),
    ("no_matmul", {"no_matmul"}),
    ("aligned_reads", {"aligned_reads"}),
    ("no_put", {"no_put"}),
    ("aligned+no_put", {"aligned_reads", "no_put"}),
    ("align+noput+nomm", {"aligned_reads", "no_put", "no_matmul"}),
]:
    cf.ABLATE = frozenset(abl)
    try:
        us, comp = timeit(fused)
        print(f"{name:22s}: {us:8.1f} us/coupling (compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:22s}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
cf.ABLATE = frozenset()
