"""PixelCNN-style causal (masked) convolution.

Mask type ``A`` zeroes the center pixel and everything after it in raster
order; type ``B`` keeps the center (reference ``layers/layers.py:52-78``).
Unlike the reference — which mutates the weight in place every forward — the
mask here is a compile-time constant multiplied into the kernel inside the
jitted graph, so XLA folds it into the weight.
"""

from __future__ import annotations

import flax.linen as nn
import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["MaskedConv", "causal_mask"]

_DN = ("NHWC", "HWIO", "NHWC")


def causal_mask(kh: int, kw: int, mask_type: str = "A") -> np.ndarray:
    """(kh, kw) binary mask; raster-causal, center excluded for type A."""
    if mask_type not in ("A", "B"):
        raise ValueError(f'Invalid "mask_type" value "{mask_type}"')
    mask = np.ones((kh, kw), dtype=np.float32)
    mask[kh // 2, kw // 2 + (mask_type == "B"):] = 0
    mask[kh // 2 + 1:] = 0
    return mask


class MaskedConv(nn.Module):
    features: int
    kernel_size: int = 5
    mask_type: str = "A"
    stride: int = 1
    padding: int | None = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2 if self.padding is None else self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, in_ch, self.features),
        )
        mask = jnp.asarray(causal_mask(k, k, self.mask_type))[:, :, None, None]
        y = lax.conv_general_dilated(
            x,
            kernel * mask,
            window_strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            dimension_numbers=_DN,
            precision=lax.Precision.HIGHEST,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y
