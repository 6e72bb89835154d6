"""Class wrappers over the functional transforms
(reference ``compressai/transforms/transforms.py:11-118``)."""

from __future__ import annotations

from . import functional as F_tpu

__all__ = ["RGB2YCbCr", "YCbCr2RGB", "YUV444To420", "YUV420To444"]


class RGB2YCbCr:
    """Convert an RGB array to YCbCr."""

    def __call__(self, rgb):
        return F_tpu.rgb2ycbcr(rgb)

    def __repr__(self):
        return f"{self.__class__.__name__}()"


class YCbCr2RGB:
    """Convert a YCbCr array to RGB."""

    def __call__(self, ycbcr):
        return F_tpu.ycbcr2rgb(ycbcr)

    def __repr__(self):
        return f"{self.__class__.__name__}()"


class YUV444To420:
    """Convert a 444 input to a 420 representation."""

    def __init__(self, mode: str = "avg_pool"):
        self.mode = str(mode)

    def __call__(self, yuv):
        return F_tpu.yuv_444_to_420(yuv, mode=self.mode)

    def __repr__(self):
        return f"{self.__class__.__name__}()"


class YUV420To444:
    """Convert a 420 input to a 444 representation."""

    def __init__(self, mode: str = "bilinear", return_tuple: bool = False):
        self.mode = str(mode)
        self.return_tuple = bool(return_tuple)

    def __call__(self, yuv):
        return F_tpu.yuv_420_to_444(yuv, mode=self.mode, return_tuple=self.return_tuple)

    def __repr__(self):
        return f"{self.__class__.__name__}(return_tuple={self.return_tuple})"
