"""Training losses (reference ``examples/train.py:49-69``).

Rate-distortion: ``L = lambda * 255^2 * MSE + bpp`` with
``bpp = sum(-log2 p) / num_pixels`` over all likelihood tensors.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["rate_distortion_loss"]


def rate_distortion_loss(output, target, lmbda: float = 1e-2):
    """Args:
        output: model forward dict with "x_hat" and "likelihoods".
        target: ground-truth image batch, same shape as x_hat.
        lmbda: rate-distortion trade-off.

    Returns dict with "loss", "mse_loss", "bpp_loss".
    """
    n, h, w = target.shape[0], target.shape[1], target.shape[2]
    num_pixels = n * h * w

    bpp_loss = sum(
        jnp.sum(-jnp.log2(lik)) / num_pixels
        for lik in _iter_likelihoods(output["likelihoods"])
    )
    mse_loss = jnp.mean(jnp.square(output["x_hat"] - target))
    loss = lmbda * 255**2 * mse_loss + bpp_loss
    return {"loss": loss, "mse_loss": mse_loss, "bpp_loss": bpp_loss}


def _iter_likelihoods(likelihoods):
    if isinstance(likelihoods, dict):
        for v in likelihoods.values():
            yield from _iter_likelihoods(v)
    elif isinstance(likelihoods, (list, tuple)):
        for v in likelihoods:
            yield from _iter_likelihoods(v)
    else:
        yield likelihoods
