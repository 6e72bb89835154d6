"""Residual / attention building blocks for the Cheng2020 family.

Faithful functional re-implementations of reference ``layers/layers.py:98-244``
with NHWC layout. Child names mirror the torch attribute names (including
numeric sub-module indices inside sequential chains) so checkpoint keys map
1:1. Each torch ``nn.Sequential`` is a dedicated flax module here because
flax registers children in the scope that *creates* them.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from .conv import Conv, SubpelConv3x3
from .gdn import GDN

__all__ = [
    "ResidualBlock",
    "ResidualBlockWithStride",
    "ResidualBlockUpsample",
    "AttentionBlock",
]


class ResidualBlockWithStride(nn.Module):
    """conv3x3(s) → LReLU → conv3x3 → GDN, plus (1x1, strided) skip
    (reference ``layers/layers.py:98-129``)."""

    out_ch: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = Conv(self.out_ch, 3, self.stride, name="conv1")(x)
        out = jax.nn.leaky_relu(out, 0.01)
        out = Conv(self.out_ch, 3, 1, name="conv2")(out)
        out = GDN(name="gdn")(out)
        if self.stride != 1 or in_ch != self.out_ch:
            identity = Conv(self.out_ch, 1, self.stride, name="skip")(x)
        else:
            identity = x
        return out + identity


class ResidualBlockUpsample(nn.Module):
    """subpel conv up → LReLU → conv3x3 → IGDN, plus subpel skip
    (reference ``layers/layers.py:132-157``)."""

    out_ch: int
    upsample: int = 2

    @nn.compact
    def __call__(self, x):
        out = SubpelConv3x3(self.out_ch, self.upsample, name="subpel_conv")(x)
        out = jax.nn.leaky_relu(out, 0.01)
        out = Conv(self.out_ch, 3, 1, name="conv")(out)
        out = GDN(inverse=True, name="igdn")(out)
        identity = SubpelConv3x3(self.out_ch, self.upsample, name="upsample")(x)
        return out + identity


class ResidualBlock(nn.Module):
    """Two 3x3 convs with LReLU, 1x1 skip on channel change
    (reference ``layers/layers.py:160-190``)."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = Conv(self.out_ch, 3, 1, name="conv1")(x)
        out = jax.nn.leaky_relu(out, 0.01)
        out = Conv(self.out_ch, 3, 1, name="conv2")(out)
        out = jax.nn.leaky_relu(out, 0.01)
        if in_ch != self.out_ch:
            identity = Conv(self.out_ch, 1, 1, name="skip")(x)
        else:
            identity = x
        return out + identity


class _ResidualUnitConv(nn.Module):
    """The inner 1x1 → ReLU → 3x3 → ReLU → 1x1 chain of a residual unit
    (torch sequential indices 0/2/4)."""

    n: int

    @nn.compact
    def __call__(self, x):
        out = Conv(self.n // 2, 1, 1, name="0")(x)
        out = jax.nn.relu(out)
        out = Conv(self.n // 2, 3, 1, name="2")(out)
        out = jax.nn.relu(out)
        return Conv(self.n, 1, 1, name="4")(out)


class _ResidualUnit(nn.Module):
    n: int

    @nn.compact
    def __call__(self, x):
        out = _ResidualUnitConv(self.n, name="conv")(x)
        return jax.nn.relu(out + x)


class _AttentionTrunkA(nn.Module):
    n: int

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = _ResidualUnit(self.n, name=str(i))(x)
        return x


class _AttentionTrunkB(nn.Module):
    n: int

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = _ResidualUnit(self.n, name=str(i))(x)
        return Conv(self.n, 1, 1, name="3")(x)


class AttentionBlock(nn.Module):
    """Conv-gated attention (NOT softmax attention): two 3-residual-unit
    trunks, sigmoid gate ``a * sigmoid(b) + x``
    (reference ``layers/layers.py:193-244``)."""

    n: int

    @nn.compact
    def __call__(self, x):
        a = _AttentionTrunkA(self.n, name="conv_a")(x)
        b = _AttentionTrunkB(self.n, name="conv_b")(x)
        return a * jax.nn.sigmoid(b) + x
