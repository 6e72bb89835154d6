"""Raw (YUV/RGB) video file access via numpy memmap.

Behavioral re-implementation of reference ``datasets/rawvideo.py``: planar
frame dtypes per chroma subsampling, bitdepth-to-dtype mapping, and
Vooya/GStreamer/ffmpeg filename metadata deduction
(``youNameIt_WIDTHxHEIGHT[_FPS[Hz|fps]][_BITSbit][_P420|...].yuv``).
"""

from __future__ import annotations

import enum
import re
from fractions import Fraction
from typing import Any, Dict, Optional, Sequence, Union

import numpy as np

__all__ = [
    "VideoFormat",
    "RawVideoSequence",
    "get_raw_video_file_info",
    "video_formats",
    "subsampling",
    "bitdepth_to_dtype",
]


class VideoFormat(enum.Enum):
    YUV400 = "yuv400"  # planar 4:0:0 YUV
    YUV420 = "yuv420"  # planar 4:2:0 YUV
    YUV422 = "yuv422"  # planar 4:2:2 YUV
    YUV444 = "yuv444"  # planar 4:4:4 YUV
    RGB = "rgb"  # planar 4:4:4 RGB


# "fourcc" spellings from Vooya, GStreamer, and ffmpeg.
video_formats = {
    "yuv400": VideoFormat.YUV400,
    "yuv420": VideoFormat.YUV420,
    "420": VideoFormat.YUV420,
    "p420": VideoFormat.YUV420,
    "i420": VideoFormat.YUV420,
    "yuv422": VideoFormat.YUV422,
    "p422": VideoFormat.YUV422,
    "i422": VideoFormat.YUV422,
    "y42B": VideoFormat.YUV422,
    "yuv444": VideoFormat.YUV444,
    "p444": VideoFormat.YUV444,
    "y444": VideoFormat.YUV444,
}

framerate_to_fraction = {
    "23.98": Fraction(24000, 1001),
    "23.976": Fraction(24000, 1001),
    "29.97": Fraction(30000, 1001),
    "59.94": Fraction(60000, 1001),
}

file_extensions = {"yuv", "rgb", "raw"}

# (horizontal, vertical) chroma subsampling divisors
subsampling = {
    VideoFormat.YUV400: (0, 0),
    VideoFormat.YUV420: (2, 2),
    VideoFormat.YUV422: (2, 1),
    VideoFormat.YUV444: (1, 1),
}

bitdepth_to_dtype = {
    8: np.uint8,
    10: np.uint16,
    12: np.uint16,
    14: np.uint16,
    16: np.uint16,
}


def make_dtype(format: VideoFormat, value_type, width: int, height: int) -> np.dtype:
    """Structured per-frame dtype with planar y/u/v fields (sub-plane sizes
    rounded like ffmpeg for odd dimensions)."""
    w_sub, h_sub = subsampling[format]
    if h_sub > 1:
        sub_height = (height + 1) // h_sub
    elif h_sub:
        sub_height = round(height / h_sub)
    else:
        sub_height = 0
    if w_sub > 1:
        sub_width = (width + 1) // w_sub
    elif w_sub:
        sub_width = round(width / w_sub)
    else:
        sub_width = 0

    return np.dtype(
        [
            ("y", value_type, (height, width)),
            ("u", value_type, (sub_height, sub_width)),
            ("v", value_type, (sub_height, sub_width)),
        ]
    )


# Filename metadata tokens, per the public Vooya naming spec
# (offminor.de/vooya-usage.html#vf: name_WIDTHxHEIGHT[_FPS(Hz|fps)]
# [_BITSbit][_P420|...].yuv) with GStreamer/ffmpeg format spellings
# (I420_10LE, yuv420p10le). Compiled once; each field parses independently.
_SIZE_RE = re.compile(r"(\d+)x(\d+)")
_RATE_RE = re.compile(r"([\d.]+)(?:Hz|fps)")
_DEPTH_RE = re.compile(r"(\d+)bit")
_FORMAT_RE = re.compile(
    "({})".format("|".join(video_formats))
    # optional fused bitdepth+endianness suffix; both GStreamer "10LE"
    # and ffmpeg "10le" casings
    + r"(?:[p_]?(\d+)(LE|BE|le|be))?"
)
_EXT_RE = re.compile("({})".format("|".join(file_extensions)))


def get_raw_video_file_info(filename: str) -> Dict[str, Any]:
    """Deduce width/height/framerate/bitdepth/format/extension from a
    Vooya/GStreamer/ffmpeg-style raw-video filename. Unrecognized fields are
    simply absent from the result; an empty dict means nothing matched."""
    out: Dict[str, Any] = {}

    if m := _SIZE_RE.search(filename):
        out["width"], out["height"] = int(m.group(1)), int(m.group(2))

    if m := _RATE_RE.search(filename):
        tok = m.group(1)
        # NTSC-style rates map to their exact fractions
        out["framerate"] = framerate_to_fraction.get(tok, Fraction(tok))

    explicit_depth = None
    if m := _DEPTH_RE.search(filename):
        explicit_depth = m.group(1)

    fused_depth = None
    if m := _FORMAT_RE.search(filename):
        fmt, fused_depth, endian = m.groups()
        out["format"] = video_formats.get(fmt.lower(), fmt)
        if endian is not None:
            out["endianness"] = endian.lower()

    if explicit_depth and fused_depth and explicit_depth != fused_depth:
        raise ValueError(f'Filename "{filename}" specifies bit-depth twice.')
    depth = fused_depth or explicit_depth
    if depth is not None:
        out["bitdepth"] = int(depth)

    if m := _EXT_RE.search(filename):
        out["extension"] = m.group(1)

    return out


def get_num_frms(file_size, width, height, video_format, dtype) -> int:
    w_sub, h_sub = subsampling[video_format]
    itemsize = np.dtype(dtype).itemsize
    frame_size = (width * height) + 2 * (
        round(width / w_sub) * round(height / h_sub)
    ) * itemsize
    return file_size // frame_size


class RawVideoSequence(Sequence[np.ndarray]):
    """Memmap-backed raw video with planar frame access.

    ``seq[i]`` yields a structured array with ``y``/``u``/``v`` fields.
    """

    def __init__(
        self,
        mmap: np.memmap,
        width: int,
        height: int,
        bitdepth: int,
        format: Union[str, VideoFormat],
        framerate=None,
    ):
        self.width = width
        self.height = height
        self.bitdepth = bitdepth
        self.framerate = framerate
        self.format = (
            video_formats[format.lower()] if isinstance(format, str) else format
        )

        value_type = bitdepth_to_dtype[bitdepth]
        self.dtype = make_dtype(self.format, value_type, width, height)
        self.data = mmap.view(self.dtype)
        self.total_frms = get_num_frms(
            mmap.size, width, height, self.format, value_type
        )
        self._path = getattr(mmap, "filename", None)

    @classmethod
    def new_like(cls, sequence: "RawVideoSequence", filename: str) -> "RawVideoSequence":
        mmap = np.memmap(filename, dtype=bitdepth_to_dtype[sequence.bitdepth], mode="r")
        return cls(
            mmap,
            width=sequence.width,
            height=sequence.height,
            bitdepth=sequence.bitdepth,
            format=sequence.format,
            framerate=sequence.framerate,
        )

    @classmethod
    def from_file(
        cls,
        filename: str,
        width: Optional[int] = None,
        height: Optional[int] = None,
        bitdepth: Optional[int] = None,
        format: Optional[VideoFormat] = None,
        framerate=None,
    ) -> "RawVideoSequence":
        info = get_raw_video_file_info(filename)
        bitdepth = bitdepth or info.get("bitdepth")
        format = format or info.get("format")
        height = height or info.get("height")
        width = width or info.get("width")
        framerate = framerate or info.get("framerate")
        if width is None or height is None or bitdepth is None or format is None:
            raise RuntimeError(f"Could not get sequence information {filename}")
        mmap = np.memmap(filename, dtype=bitdepth_to_dtype[bitdepth], mode="r")
        return cls(
            mmap, width=width, height=height, bitdepth=bitdepth,
            format=format, framerate=framerate,
        )

    def __getitem__(self, index):
        return self.data[index]

    def __len__(self) -> int:
        return len(self.data)

    def close(self):
        del self.data
