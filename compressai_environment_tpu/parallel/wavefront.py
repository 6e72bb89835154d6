"""Blocked-wavefront scheduling for autoregressive context models.

The reference's AR codec visits latent pixels in raster order, one at a time
(``models/google.py:535-577``). With a 5x5 type-A causal mask, pixel (h, w)
depends only on pixels (h', w') with ``3h' + w' < 3h + w`` — rows above see
columns up to w+2, so the skewed schedule ``t = 3h + w`` is the tightest
wavefront. All pixels on a wavefront are computed in one step as a batched
gather + GEMM; a full H x W grid takes ``3(H-1) + W`` steps instead of
``H * W``.

Encode: the wavefront produces exactly the same symbols as the serial raster
scan (verified in tests), so the resulting stream is byte-identical to the
reference path. Decode under the reference's single raster stream is
inherently serial; the "tpu" stream format codes each (row, channel-block)
as its own rANS lane so decode can follow the same wavefront (see
``wavefront_decode``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import causal_mask

__all__ = ["ARWeightsDevice", "wavefront_encode_symbols"]

_K = 5  # context kernel size
_PAD = 2


class ARWeightsDevice:
    """Device-resident AR-path weights for a JointAR-family model."""

    def __init__(self, params, M: int):
        cp = params["context_prediction"]
        mask = jnp.asarray(causal_mask(_K, _K, "A"))[:, :, None, None]
        self.ctx_kernel = (jnp.asarray(cp["kernel"]) * mask).reshape(-1, 2 * M)
        self.ctx_bias = jnp.asarray(cp["bias"])
        ep = params["entropy_parameters"]
        self.ep = tuple(
            (
                jnp.asarray(ep[n]["kernel"]).reshape(
                    ep[n]["kernel"].shape[2], -1
                ),
                jnp.asarray(ep[n]["bias"]),
            )
            for n in ("0", "2", "4")
        )
        self.M = M

    def entropy_parameters(self, v):
        return _ep_apply(self.ep, v)

    def tree(self):
        return {
            "ctx_kernel": self.ctx_kernel,
            "ctx_bias": self.ctx_bias,
            "ep": self.ep,
        }


def _ep_apply(ep, v):
    for i, (w, b) in enumerate(ep):
        v = v @ w + b
        if i < len(ep) - 1:
            v = jax.nn.leaky_relu(v, 0.01)
    return v


@partial(jax.jit, static_argnames=("H", "W", "M"))
def _wavefront_encode(y, params_hs, weights, scale_table, H: int, W: int, M: int):
    """y: (H, W, M); params_hs: (H, W, 2M). Returns (symbols, indexes,
    y_hat) each (H, W, M) — identical to the serial raster AR encode."""
    ctx_kernel = weights["ctx_kernel"]
    ctx_bias = weights["ctx_bias"]
    ep = weights["ep"]

    A = min(H, (W + 2) // 3 + 1)  # max simultaneously-active rows
    T = 3 * (H - 1) + W

    y_hat0 = jnp.zeros((H + 2 * _PAD, W + 2 * _PAD, M), jnp.float32)
    symbols0 = jnp.zeros((H, W, M), jnp.int32)
    indexes0 = jnp.zeros((H, W, M), jnp.int32)

    def crop_at(y_hat, h, w):
        return jax.lax.dynamic_slice(y_hat, (h, w, 0), (_K, _K, M))

    def step(t, carry):
        y_hat, symbols, indexes = carry
        h_lo = jnp.maximum(0, (t - W + 1 + 2) // 3)  # ceil((t-W+1)/3)
        hs = h_lo + jnp.arange(A)
        ws = t - 3 * hs
        active = (hs < H) & (ws >= 0) & (ws < W)
        hs_c = jnp.clip(hs, 0, H - 1)
        ws_c = jnp.clip(ws, 0, W - 1)

        crops = jax.vmap(lambda h, w: crop_at(y_hat, h, w))(hs_c, ws_c)
        ctx = crops.reshape(A, -1) @ ctx_kernel + ctx_bias
        p = params_hs[hs_c, ws_c]  # (A, 2M)
        gp = _ep_apply(ep, jnp.concatenate([p, ctx], axis=-1))
        scales_hat, means_hat = gp[:, :M], gp[:, M:]

        idx = jnp.searchsorted(
            scale_table[:-1], jnp.maximum(scales_hat, 0.11), side="left"
        ).astype(jnp.int32)
        y_cur = y[hs_c, ws_c]
        y_q = jnp.round(y_cur - means_hat).astype(jnp.int32)
        recon = y_q.astype(jnp.float32) + means_hat

        # masked scatter of recon into the padded y_hat
        def write_row(y_hat, i):
            return jax.lax.cond(
                active[i],
                lambda yh: jax.lax.dynamic_update_slice(
                    yh, recon[i][None, None, :], (hs_c[i] + _PAD, ws_c[i] + _PAD, 0)
                ),
                lambda yh: yh,
                y_hat,
            )

        y_hat = jax.lax.fori_loop(0, A, lambda i, yh: write_row(yh, i), y_hat)

        # inactive rows are routed out of bounds and dropped, so they can't
        # clobber an active row's write through index clipping
        hs_s = jnp.where(active, hs_c, H)
        symbols = symbols.at[hs_s, ws_c].set(y_q, mode="drop")
        indexes = indexes.at[hs_s, ws_c].set(idx, mode="drop")
        return y_hat, symbols, indexes

    y_hat, symbols, indexes = jax.lax.fori_loop(
        0, T, step, (y_hat0, symbols0, indexes0)
    )
    return symbols, indexes, y_hat[_PAD : _PAD + H, _PAD : _PAD + W]


def wavefront_encode_symbols(y, params_hs, weights: ARWeightsDevice, scale_table):
    """AR-encode one image's latents on device.

    Args:
        y: (H, W, M) latent.
        params_hs: (H, W, 2M) hyper-decoder output.
        weights: :class:`ARWeightsDevice`.
        scale_table: (n,) float32.

    Returns (symbols, indexes, y_hat) numpy-convertible device arrays.
    """
    H, W, M = y.shape
    return _wavefront_encode(
        jnp.asarray(y), jnp.asarray(params_hs), weights.tree(),
        jnp.asarray(scale_table), H, W, M,
    )
