from .blocks import (
    AttentionBlock,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
)
from .conv import Conv, Deconv, SubpelConv3x3, conv1x1, conv3x3, pixel_shuffle, subpel_conv3x3
from .gdn import GDN, GDN1
from .masked_conv import MaskedConv, causal_mask
from .qrelu import qrelu

__all__ = [
    "AttentionBlock",
    "ResidualBlock",
    "ResidualBlockUpsample",
    "ResidualBlockWithStride",
    "Conv",
    "Deconv",
    "SubpelConv3x3",
    "conv1x1",
    "conv3x3",
    "subpel_conv3x3",
    "pixel_shuffle",
    "GDN",
    "GDN1",
    "MaskedConv",
    "causal_mask",
    "qrelu",
]
