"""Convolution primitives with the reference geometry, NHWC/HWIO layout.

``Conv`` matches ``nn.Conv2d(k, stride=s, padding=k//2)`` and ``Deconv``
matches ``nn.ConvTranspose2d(k, stride=s, padding=k//2, output_padding=s-1)``
(reference ``compressai/models/utils.py:128-146``) so decoded latents line up
pixel-for-pixel with reference checkpoints.

The transposed conv is expressed as an input-dilated convolution: zero-stuff
by ``stride``, pad ``(k-1-p, k-1-p+op)`` per spatial dim, correlate. The
parameter ``kernel_t`` holds the kernel in HWIO layout *already spatially
flipped* relative to torch's ``(in, out, kh, kw)`` weight; the zoo importer
performs the flip+transpose once at load time.

Channel-last keeps the channel contraction on the MXU lanes and lets XLA fuse
the surrounding elementwise ops.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["Conv", "Deconv", "conv3x3", "conv1x1", "subpel_conv3x3", "pixel_shuffle"]

_DN = ("NHWC", "HWIO", "NHWC")


class Conv(nn.Module):
    """2-D convolution, torch ``Conv2d(k, s, padding=k//2)`` geometry."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    padding: int | None = None  # default: kernel_size // 2
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
        # follow the parameter dtype (half() casts params to bfloat16;
        # upstream fp32 accumulations are demoted here)
        x = x.astype(kernel.dtype)
        y = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            dimension_numbers=_DN,
            precision=lax.Precision.HIGHEST,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


def fold_deconv_kernel_5s2(kt):
    """Fold a (5, 5, Cin, Cout) stride-2 deconv kernel (torch
    ``ConvTranspose2d(5, 2, padding=2, output_padding=1)`` geometry,
    already spatially flipped) into the (3, 3, Cin, 4*Cout) kernel of an
    equivalent 1-stride conv whose output ``pixel_shuffle(r=2)``s to the
    deconv output. Output phase (dy, dx) of pixel (2q+dy, 2r+dx) reads
    input taps (q + t - 1) where kernel tap ``a = 2t - dy`` (rows; same
    for columns) — taps with a outside [0, 5) are zero."""
    k, _, ci, co = kt.shape
    assert k == 5
    out = jnp.zeros((3, 3, ci, co, 2, 2), kt.dtype)
    for ty in range(3):
        for dy in range(2):
            a = 2 * ty - dy
            if not 0 <= a < k:
                continue
            for tx in range(3):
                for dx in range(2):
                    b = 2 * tx - dx
                    if not 0 <= b < k:
                        continue
                    out = out.at[ty, tx, :, :, dy, dx].set(kt[a, b])
    # channel layout c*4 + dy*2 + dx matches pixel_shuffle(r=2)
    return out.reshape(3, 3, ci, co * 4)


class Deconv(nn.Module):
    """2-D transposed convolution, torch
    ``ConvTranspose2d(k, s, padding=k//2, output_padding=s-1)`` geometry
    (output size = input * stride)."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    padding: int | None = None
    output_padding: int | None = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        s = self.stride
        p = k // 2 if self.padding is None else self.padding
        op = s - 1 if self.output_padding is None else self.output_padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel_t",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, in_ch, self.features),
        )
        x = x.astype(kernel.dtype)
        lo = k - 1 - p
        hi = k - 1 - p + op
        if (
            kernel.dtype == jnp.bfloat16 and k == 5 and s == 2
            and p == 2 and op == 1 and self.features <= 8
        ):
            # tiny-output deconv (the g_s final 128->3): the zero-stuffed
            # direct form ran at ~1% of MXU peak (measured 6.7 ms for the
            # 24x Kodak batch); the folded phase-conv + depth-to-space is
            # ~4.1 ms. Only a win when the output channel count rounds
            # into the same MXU lane quantum either way, so gated to <= 8
            # features. Half-mode only: the f32 path keeps the exact
            # reference accumulation order for bitstream parity.
            kf = fold_deconv_kernel_5s2(kernel)
            y = lax.conv_general_dilated(
                x, kf, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN,
                precision=lax.Precision.DEFAULT,
            )
            y = pixel_shuffle(y, 2)
        else:
            y = lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(1, 1),
                padding=[(lo, hi), (lo, hi)],
                lhs_dilation=(s, s),
                dimension_numbers=_DN,
                precision=lax.Precision.HIGHEST,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


def conv3x3(out_ch: int, stride: int = 1, name: str | None = None) -> Conv:
    """3x3 convolution with padding (reference ``layers/layers.py:81``)."""
    return Conv(out_ch, kernel_size=3, stride=stride, name=name)


def conv1x1(out_ch: int, stride: int = 1, name: str | None = None) -> Conv:
    """1x1 convolution (reference ``layers/layers.py:93``)."""
    return Conv(out_ch, kernel_size=1, stride=stride, name=name)


def pixel_shuffle(x, r: int):
    """Depth-to-space matching torch ``PixelShuffle`` channel ordering.

    NHWC input with ``C * r**2`` channels indexed ``c*r*r + i*r + j`` maps to
    output pixel ``(h*r+i, w*r+j, c)``.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


class SubpelConv3x3(nn.Module):
    """3x3 conv + pixel shuffle upsample (reference ``layers/layers.py:86-90``)."""

    features: int
    r: int = 1

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features * self.r**2, kernel_size=3, stride=1, name="0")(x)
        return pixel_shuffle(y, self.r)


def subpel_conv3x3(out_ch: int, r: int = 1, name: str | None = None) -> SubpelConv3x3:
    return SubpelConv3x3(out_ch, r, name=name)
