"""QReLU: clamp to [0, 2**bit_depth - 1] with a smooth surrogate gradient
outside the range (reference ``layers/layers.py:247-296``; Ballé et al.,
"Integer networks for data compression with latent-variable models")."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["qrelu"]

_ALPHA = 0.9943258522851727


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def qrelu(x, bit_depth: int = 8, beta: float = 100.0):
    max_value = 2**bit_depth - 1
    return jnp.clip(x, 0, max_value)


def _qrelu_fwd(x, bit_depth, beta):
    return qrelu(x, bit_depth, beta), x


def _qrelu_bwd(bit_depth, beta, x, g):
    max_value = 2**bit_depth - 1
    grad_sub = (
        jnp.exp(
            (-(_ALPHA**beta)) * jnp.abs(2.0 * x / max_value - 1) ** beta
        )
        * g
    )
    outside = (x < 0) | (x > max_value)
    return (jnp.where(outside, grad_sub, g),)


qrelu.defvjp(_qrelu_fwd, _qrelu_bwd)
