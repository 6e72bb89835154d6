"""Named analysis/synthesis/hyper transform stacks for the google-family
models (reference ``models/google.py``).

Each torch ``nn.Sequential`` becomes a dedicated flax module whose children
carry the torch integer index as their flax name, so checkpoint keys like
``g_a.4.weight`` map mechanically to ``g_a/4/kernel``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import (
    AttentionBlock,
    Conv,
    Deconv,
    GDN,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv3x3,
)

__all__ = [
    "AnalysisTransform",
    "SynthesisTransform",
    "HyperAnalysisAbs",
    "HyperSynthesisScale",
    "HyperAnalysisMS",
    "HyperSynthesisMS",
    "HyperAnalysisJoint",
    "HyperSynthesisJoint",
    "EntropyParameters",
    "ChengAnalysis",
    "ChengSynthesis",
    "ChengHyperAnalysis",
    "ChengHyperSynthesis",
]


class AnalysisTransform(nn.Module):
    """g_a: 4x (conv5x5 s2 + GDN), last conv to M (``models/google.py:134-143``)."""

    N: int
    M: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        x = Conv(self.N, k, 2, name="0")(x)
        x = GDN(name="1")(x)
        x = Conv(self.N, k, 2, name="2")(x)
        x = GDN(name="3")(x)
        x = Conv(self.N, k, 2, name="4")(x)
        x = GDN(name="5")(x)
        return Conv(self.M, k, 2, name="6")(x)


class SynthesisTransform(nn.Module):
    """g_s: mirrored deconv + IGDN stack, output 3 channels
    (``models/google.py:145-152``)."""

    N: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, y):
        k = self.kernel_size
        y = Deconv(self.N, k, 2, name="0")(y)
        y = GDN(inverse=True, name="1")(y)
        y = Deconv(self.N, k, 2, name="2")(y)
        y = GDN(inverse=True, name="3")(y)
        y = Deconv(self.N, k, 2, name="4")(y)
        y = GDN(inverse=True, name="5")(y)
        return Deconv(3, k, 2, name="6")(y)


class HyperAnalysisAbs(nn.Module):
    """ScaleHyperprior h_a over |y| (``models/google.py:229-235``); the abs
    is applied by the caller."""

    N: int

    @nn.compact
    def __call__(self, y):
        y = Conv(self.N, 3, 1, name="0")(y)
        y = jax.nn.relu(y)
        y = Conv(self.N, 5, 2, name="2")(y)
        y = jax.nn.relu(y)
        return Conv(self.N, 5, 2, name="4")(y)


class HyperSynthesisScale(nn.Module):
    """ScaleHyperprior h_s -> scales (``models/google.py:237-244``)."""

    N: int
    M: int

    @nn.compact
    def __call__(self, z):
        z = Deconv(self.N, 5, 2, name="0")(z)
        z = jax.nn.relu(z)
        z = Deconv(self.N, 5, 2, name="2")(z)
        z = jax.nn.relu(z)
        z = Conv(self.M, 3, 1, name="4")(z)
        return jax.nn.relu(z)


class HyperAnalysisMS(nn.Module):
    """MeanScaleHyperprior h_a (``models/google.py:413-419``)."""

    N: int

    @nn.compact
    def __call__(self, y):
        y = Conv(self.N, 3, 1, name="0")(y)
        y = jax.nn.leaky_relu(y, 0.01)
        y = Conv(self.N, 5, 2, name="2")(y)
        y = jax.nn.leaky_relu(y, 0.01)
        return Conv(self.N, 5, 2, name="4")(y)


class HyperSynthesisMS(nn.Module):
    """MeanScaleHyperprior h_s -> 2M params (``models/google.py:421-427``)."""

    N: int
    M: int

    @nn.compact
    def __call__(self, z):
        z = Deconv(self.M, 5, 2, name="0")(z)
        z = jax.nn.leaky_relu(z, 0.01)
        z = Deconv(self.M * 3 // 2, 5, 2, name="2")(z)
        z = jax.nn.leaky_relu(z, 0.01)
        return Conv(self.M * 2, 3, 1, name="4")(z)


# mbt2018 joint-AR hyper transforms are the same shapes as MS
HyperAnalysisJoint = HyperAnalysisMS
HyperSynthesisJoint = HyperSynthesisMS


class EntropyParameters(nn.Module):
    """1x1-conv MLP fusing hyper + context params (``models/google.py:446-452``)."""

    M: int

    @nn.compact
    def __call__(self, x):
        x = Conv(self.M * 10 // 3, 1, 1, name="0")(x)
        x = jax.nn.leaky_relu(x, 0.01)
        x = Conv(self.M * 8 // 3, 1, 1, name="2")(x)
        x = jax.nn.leaky_relu(x, 0.01)
        return Conv(self.M * 6 // 3, 1, 1, name="4")(x)


# ---------------------------------------------------------------------------
# Cheng2020 transforms (reference models/waseda.py:44-153)
# ---------------------------------------------------------------------------


class ChengAnalysis(nn.Module):
    N: int
    attention: bool = False

    @nn.compact
    def __call__(self, x):
        n = self.N
        if not self.attention:
            x = ResidualBlockWithStride(n, 2, name="0")(x)
            x = ResidualBlock(n, name="1")(x)
            x = ResidualBlockWithStride(n, 2, name="2")(x)
            x = ResidualBlock(n, name="3")(x)
            x = ResidualBlockWithStride(n, 2, name="4")(x)
            x = ResidualBlock(n, name="5")(x)
            return Conv(n, 3, 2, name="6")(x)
        x = ResidualBlockWithStride(n, 2, name="0")(x)
        x = ResidualBlock(n, name="1")(x)
        x = ResidualBlockWithStride(n, 2, name="2")(x)
        x = AttentionBlock(n, name="3")(x)
        x = ResidualBlock(n, name="4")(x)
        x = ResidualBlockWithStride(n, 2, name="5")(x)
        x = ResidualBlock(n, name="6")(x)
        x = Conv(n, 3, 2, name="7")(x)
        return AttentionBlock(n, name="8")(x)


class ChengSynthesis(nn.Module):
    N: int
    attention: bool = False

    @nn.compact
    def __call__(self, y):
        n = self.N
        if not self.attention:
            y = ResidualBlock(n, name="0")(y)
            y = ResidualBlockUpsample(n, 2, name="1")(y)
            y = ResidualBlock(n, name="2")(y)
            y = ResidualBlockUpsample(n, 2, name="3")(y)
            y = ResidualBlock(n, name="4")(y)
            y = ResidualBlockUpsample(n, 2, name="5")(y)
            y = ResidualBlock(n, name="6")(y)
            return SubpelConv3x3(3, 2, name="7")(y)
        y = AttentionBlock(n, name="0")(y)
        y = ResidualBlock(n, name="1")(y)
        y = ResidualBlockUpsample(n, 2, name="2")(y)
        y = ResidualBlock(n, name="3")(y)
        y = ResidualBlockUpsample(n, 2, name="4")(y)
        y = AttentionBlock(n, name="5")(y)
        y = ResidualBlock(n, name="6")(y)
        y = ResidualBlockUpsample(n, 2, name="7")(y)
        y = ResidualBlock(n, name="8")(y)
        return SubpelConv3x3(3, 2, name="9")(y)


class ChengHyperAnalysis(nn.Module):
    N: int

    @nn.compact
    def __call__(self, y):
        n = self.N
        y = Conv(n, 3, 1, name="0")(y)
        y = jax.nn.leaky_relu(y, 0.01)
        y = Conv(n, 3, 1, name="2")(y)
        y = jax.nn.leaky_relu(y, 0.01)
        y = Conv(n, 3, 2, name="4")(y)
        y = jax.nn.leaky_relu(y, 0.01)
        y = Conv(n, 3, 1, name="6")(y)
        y = jax.nn.leaky_relu(y, 0.01)
        return Conv(n, 3, 2, name="8")(y)


class ChengHyperSynthesis(nn.Module):
    N: int

    @nn.compact
    def __call__(self, z):
        n = self.N
        z = Conv(n, 3, 1, name="0")(z)
        z = jax.nn.leaky_relu(z, 0.01)
        z = SubpelConv3x3(n, 2, name="2")(z)
        z = jax.nn.leaky_relu(z, 0.01)
        z = Conv(n * 3 // 2, 3, 1, name="4")(z)
        z = jax.nn.leaky_relu(z, 0.01)
        z = SubpelConv3x3(n * 3 // 2, 2, name="6")(z)
        z = jax.nn.leaky_relu(z, 0.01)
        return Conv(n * 2, 3, 1, name="8")(z)
