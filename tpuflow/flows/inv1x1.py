"""Invertible 1x1 convolution, LU-parameterized.

Parity: SURVEY.md §2 "Invertible 1x1 conv" / Kingma & Dhariwal 2018
§3.2: a learned channel-mixing linear map W applied at every pixel;
logdet = H*W*log|det W|. The LU parameterization W = P L (U + diag(s))
makes log|det| a sum of log|s| (O(C)) and the inverse two triangular
solves — never an explicit ``inv`` of a free matrix (SURVEY.md §7 hard
part 1: invertibility numerics on TPU).

TPU-first: the per-pixel mix is a single (B*H*W, C) x (C, C) matmul on
the MXU, always float32 with ``Precision.HIGHEST`` so the <1e-4
reconstruction gate holds. P and sign(s) are non-trainable and live in
the ``buffers`` variable collection.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuflow.flows.layout import batch_shape, spatial_hw


def _lu_init(rng: jax.Array, c: int):
    """Random rotation -> pivoted LU factors (host-side, init only)."""
    w = jax.random.normal(rng, (c, c), dtype=jnp.float32)
    q, _ = jnp.linalg.qr(w)
    p, l, u = jax.scipy.linalg.lu(q)
    s = jnp.diagonal(u)
    return p, l, u, s


def compute_w_inv(
    l_free: jax.Array,
    u_free: jax.Array,
    log_s: jax.Array,
    p: jax.Array,
    sign_s: jax.Array,
) -> jax.Array:
    """W^{-1} from the LU factors (pure; used to hoist the triangular
    solves out of autoregressive scan loops — they are loop-invariant
    w.r.t. time, and per-step solves serialize badly on TPU)."""
    c = log_s.shape[0]
    eye = jnp.eye(c, dtype=jnp.float32)
    l_mat = jnp.tril(l_free, -1) + eye
    u_mat = jnp.triu(u_free, 1) + jnp.diag(sign_s * jnp.exp(log_s))
    with jax.default_matmul_precision("highest"):
        l_inv = jax.scipy.linalg.solve_triangular(
            l_mat, eye, lower=True, unit_diagonal=True
        )
        u_inv = jax.scipy.linalg.solve_triangular(u_mat, eye, lower=False)
        return u_inv @ (l_inv @ p.T)


class InvConv1x1LU(nn.Module):
    """y[b,h,w,:] = x[b,h,w,:] @ W with W = P @ L @ (U + diag(sign*exp(log_s))).

    The per-pixel channel mix contracts the LAST axis, so it is
    layout-independent; ``layout`` only shapes the logdet stream."""

    layout: str = "nhwc"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        reverse: bool = False,
        w_inv: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        c = x.shape[-1]

        # Factor ONE random rotation during init and share it across all
        # five variables (linen folds a different rng into each param,
        # so per-param initializers would otherwise factor five
        # different matrices).
        if self.is_initializing():
            p0, l0, u0, s0 = _lu_init(self.make_rng("params"), c)
            pieces = {
                "l": jnp.tril(l0, -1),
                "u": jnp.triu(u0, 1),
                "log_s": jnp.log(jnp.abs(s0)),
                "p": p0,
                "sign_s": jnp.sign(s0),
            }
        else:
            pieces = {}

        def make(field):
            # Outside init, flax still eval_shapes the initializer to
            # validate parameter shapes — return zeros abstractly.
            shape = (c,) if field in ("log_s", "sign_s") else (c, c)

            def init(rng, _=None):
                if pieces:
                    return pieces[field]
                return jnp.zeros(shape, jnp.float32)

            return init

        # Trainable LU factors.
        l_free = self.param("l", make("l"), (c, c))
        u_free = self.param("u", make("u"), (c, c))
        log_s = self.param("log_s", make("log_s"), (c,))
        # Fixed structure: permutation + diagonal signs.
        p_buf = self.variable("buffers", "p", make("p"), None)
        sign_buf = self.variable("buffers", "sign_s", make("sign_s"), None)

        eye = jnp.eye(c, dtype=jnp.float32)
        l_mat = jnp.tril(l_free, -1) + eye
        u_mat = jnp.triu(u_free, 1) + jnp.diag(
            sign_buf.value * jnp.exp(log_s)
        )

        hp = jax.lax.Precision.HIGHEST
        x32 = x.astype(jnp.float32)
        h, w = spatial_hw(x, self.layout)
        logdet = jnp.broadcast_to(
            h * w * jnp.sum(log_s), batch_shape(x, self.layout)
        ).astype(jnp.float32)

        # Everything here must run at full f32 precision: on TPU the
        # default matmul lowering is single-pass bf16, which turns the
        # triangular solves / C-by-C products into a ~1e-2 roundtrip
        # error and blows the <1e-4 gate. The context also covers ops
        # (solve_triangular) that take no explicit precision argument.
        with jax.default_matmul_precision("highest"):
            if reverse:
                # x = y @ W^{-1}; W^{-1} = U^{-1} L^{-1} P^{-1} via two
                # triangular solves of the identity (C is small, O(C^3)
                # is negligible next to the field matmul). A precomputed
                # w_inv (see compute_w_inv / TMGlow.build_inv_caches)
                # skips the solves — used inside rollout scans where
                # they are loop-invariant.
                if w_inv is None:
                    w_inv = compute_w_inv(
                        l_free, u_free, log_s, p_buf.value, sign_buf.value
                    )
                y = jnp.einsum("...c,cd->...d", x32, w_inv, precision=hp)
                return y, -logdet

            w_mat = p_buf.value @ (l_mat @ u_mat)
            y = jnp.einsum("...c,cd->...d", x32, w_mat, precision=hp)
            return y, logdet
