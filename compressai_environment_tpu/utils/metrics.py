"""Image quality metrics: PSNR and MS-SSIM.

MS-SSIM follows Wang et al. 2003 with the standard 5-scale weights and an
11x11 sigma=1.5 Gaussian window, valid-convolution semantics — the same
conventions as the ``pytorch_msssim`` package used by the reference eval
harness (``utils/eval_model/__main__.py:126-129``). Implemented in JAX
(jittable, runs on TPU); inputs are channel-last float arrays in [0, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["psnr", "ssim", "ms_ssim"]

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a, b, max_val: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB (reference ``eval_model:81-83``
    computes over [0,255]; equivalent for any consistent max_val)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean(jnp.square(a - b))
    return float(20 * jnp.log10(max_val) - 10 * jnp.log10(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_valid(x, win):
    """Separable valid-mode Gaussian filter over H, W of NHWC input,
    depthwise per channel."""
    c = x.shape[-1]
    kh = win.reshape(-1, 1, 1, 1) * np.ones((1, 1, 1, c), np.float32)
    kw = win.reshape(1, -1, 1, 1) * np.ones((1, 1, 1, c), np.float32)
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(
        x, jnp.asarray(kh), (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=lax.Precision.HIGHEST,
    )
    x = lax.conv_general_dilated(
        x, jnp.asarray(kw), (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=lax.Precision.HIGHEST,
    )
    return x


def _ssim_per_scale(x, y, win, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter2d_valid(x, win)
    mu_y = _filter2d_valid(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y

    sigma_xx = _filter2d_valid(x * x, win) - mu_xx
    sigma_yy = _filter2d_valid(y * y, win) - mu_yy
    sigma_xy = _filter2d_valid(x * y, win) - mu_xy

    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return jnp.mean(ssim_map), jnp.mean(cs)


def _avg_pool2(x):
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _as_nhwc(x):
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    return x


@partial(jax.jit, static_argnames=("data_range",))
def _ssim_jit(x, y, data_range=1.0):
    win = _gaussian_window()
    s, _ = _ssim_per_scale(x, y, win, data_range)
    return s


def ssim(a, b, data_range: float = 1.0) -> float:
    return float(_ssim_jit(_as_nhwc(a), _as_nhwc(b), data_range))


@partial(jax.jit, static_argnames=("data_range",))
def _ms_ssim_jit(x, y, data_range=1.0):
    win = _gaussian_window()
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    vals = []
    for i in range(len(_MSSSIM_WEIGHTS)):
        s, cs = _ssim_per_scale(x, y, win, data_range)
        vals.append(s if i == len(_MSSSIM_WEIGHTS) - 1 else cs)
        if i < len(_MSSSIM_WEIGHTS) - 1:
            x, y = _avg_pool2(x), _avg_pool2(y)
    vals = jnp.stack(vals)
    # negative cs values are clamped (as in pytorch_msssim relu mode off ->
    # direct product; clamp keeps the root real)
    vals = jnp.maximum(vals, 0.0)
    return jnp.prod(vals**weights)


def ms_ssim(a, b, data_range: float = 1.0) -> float:
    """Multi-scale SSIM; inputs must be at least 161x161 for 5 scales."""
    return float(_ms_ssim_jit(_as_nhwc(a), _as_nhwc(b), data_range))
