"""Cheng2020 anchor/attention codecs (reference ``models/waseda.py:44-153``).

Same joint autoregressive entropy machinery as mbt2018 (N == M), with
residual-block analysis/synthesis and (for the attention variant)
conv-gated attention blocks. The paper's Gaussian-mixture likelihood is
simplified to a single Gaussian, matching the reference.
"""

from __future__ import annotations

from .joint_ar import JointARNet, JointAutoregressiveHierarchicalPriors
from .transforms import (
    ChengAnalysis,
    ChengHyperAnalysis,
    ChengHyperSynthesis,
    ChengSynthesis,
    EntropyParameters,
)
from ..entropy_models import EntropyBottleneck, GaussianConditional
from ..layers import MaskedConv

__all__ = ["Cheng2020Anchor", "Cheng2020Attention"]


class Cheng2020AnchorNet(JointARNet):
    def setup(self):
        self.g_a = ChengAnalysis(self.N, attention=False)
        self.g_s = ChengSynthesis(self.N, attention=False)
        self.h_a = ChengHyperAnalysis(self.N)
        self.h_s = ChengHyperSynthesis(self.N)
        self.entropy_parameters = EntropyParameters(self.M)
        self.context_prediction = MaskedConv(2 * self.M, kernel_size=5, mask_type="A")
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian_conditional = GaussianConditional()


class Cheng2020AttentionNet(Cheng2020AnchorNet):
    def setup(self):
        self.g_a = ChengAnalysis(self.N, attention=True)
        self.g_s = ChengSynthesis(self.N, attention=True)
        self.h_a = ChengHyperAnalysis(self.N)
        self.h_s = ChengHyperSynthesis(self.N)
        self.entropy_parameters = EntropyParameters(self.M)
        self.context_prediction = MaskedConv(2 * self.M, kernel_size=5, mask_type="A")
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian_conditional = GaussianConditional()


class Cheng2020Anchor(JointAutoregressiveHierarchicalPriors):
    net_cls = Cheng2020AnchorNet

    def __init__(self, N=192, params=None):
        super().__init__(N=N, M=N, params=params)


class Cheng2020Attention(Cheng2020Anchor):
    net_cls = Cheng2020AttentionNet
