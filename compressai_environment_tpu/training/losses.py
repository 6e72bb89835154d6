"""Training losses (reference ``examples/train.py:49-69``).

Rate-distortion: ``L = lambda * 255^2 * MSE + bpp`` with
``bpp = sum(-log2 p) / num_pixels`` over all likelihood tensors.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["rate_distortion_loss", "video_rate_distortion_loss"]


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


def video_rate_distortion_loss(output, targets, lmbda: float = 1e-2,
                               bitdepth: int = 8):
    """Video RD loss over a GOP (reference ``examples/train_video.py:70-170``):
    per-frame mean MSE scaled by ``(2^bitdepth - 1)^2``, averaged over frames;
    bpp normalized by ``H * W * num_frames``.

    Args:
        output: forward dict with "x_hat" (list of frames) and "likelihoods"
            (list of per-frame nested dicts).
        targets: list of ground-truth frames (B, H, W, C).
    """
    num_frames = len(targets)
    h, w = targets[0].shape[1], targets[0].shape[2]
    num_pixels = h * w * num_frames
    scale = (2**bitdepth - 1) ** 2

    distortions = [
        jnp.mean(jnp.square(x_hat - x))
        for x_hat, x in zip(output["x_hat"], targets)
    ]
    mse_loss = sum(distortions) / num_frames
    scaled_distortion = scale * mse_loss

    bpp_loss = sum(
        jnp.sum(-jnp.log2(lik)) / (num_pixels * targets[0].shape[0])
        for lik in _iter_likelihoods(output["likelihoods"])
    )
    loss = lmbda * scaled_distortion + bpp_loss
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
