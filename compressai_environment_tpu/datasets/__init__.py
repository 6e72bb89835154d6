from .image import ImageFolder, load_image
from .rawvideo import (
    RawVideoSequence,
    VideoFormat,
    get_raw_video_file_info,
    bitdepth_to_dtype,
    subsampling,
    video_formats,
)
from .video import VideoFolder

__all__ = [
    "ImageFolder",
    "load_image",
    "VideoFolder",
    "RawVideoSequence",
    "VideoFormat",
    "get_raw_video_file_info",
    "bitdepth_to_dtype",
    "subsampling",
    "video_formats",
]
