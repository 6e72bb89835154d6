"""Classical-codec benchmark harness (reference ``utils/bench/codecs.py``).

``Codec.run(filepath, quality)`` returns
``{bpp, encoding_time, decoding_time, psnr, ms-ssim}``. Pillow-based JPEG /
WebP codecs work out of the box; JPEG2000/HM/VTM/x26x wrappers shell out to
external binaries and raise a clear error when the binary is absent
(this container ships none of them).
"""

from __future__ import annotations

import io
import os
import platform
import subprocess
import sys
import time
from tempfile import mkstemp

import numpy as np

from ..metrics import ms_ssim, psnr

__all__ = ["Codec", "PillowCodec", "JPEG", "WebP", "BinaryCodec", "JPEG2000", "BPG"]


def filesize(filepath: str) -> int:
    from pathlib import Path

    if not Path(filepath).is_file():
        raise ValueError(f'Invalid file "{filepath}".')
    return Path(filepath).stat().st_size


def read_image(filepath: str):
    from PIL import Image

    return Image.open(filepath).convert("RGB")


def _metrics(a, b):
    a = np.asarray(a, np.float32) / 255.0
    b = np.asarray(b, np.float32) / 255.0
    return {
        "psnr": psnr(a * 255, b * 255, 255.0),
        "ms-ssim": ms_ssim(a, b),
    }


class Codec:
    """Abstract codec (reference ``codecs.py:145-187``)."""

    fmt = None
    _description = None

    def __init__(self, args=None):
        self.args = args

    @property
    def description(self):
        return self._description

    @property
    def name(self):
        raise NotImplementedError()

    def add_parser_args(self, parser):
        pass

    def run(self, filepath, quality, metrics=None, return_rec=False):
        raise NotImplementedError()


class PillowCodec(Codec):
    """Pillow-encodable codecs (reference ``codecs.py:190-243``)."""

    def run(self, filepath, quality, metrics=None, return_rec=False):
        img = read_image(filepath)

        start = time.time()
        tmp = io.BytesIO()
        img.save(tmp, format=self.fmt, quality=int(quality))
        enc_time = time.time() - start
        tmp.seek(0)
        size = tmp.getbuffer().nbytes

        start = time.time()
        from PIL import Image

        rec = Image.open(tmp)
        rec.load()
        dec_time = time.time() - start

        bpp_val = float(size) * 8 / (img.size[0] * img.size[1])
        out = _metrics(img, rec.convert("RGB"))
        out.update(
            {"bpp": bpp_val, "encoding_time": enc_time, "decoding_time": dec_time}
        )
        if return_rec:
            return out, rec
        return out


class JPEG(PillowCodec):
    fmt = "jpeg"
    _description = "JPEG (Pillow)"

    @property
    def name(self):
        return "JPEG"


class WebP(PillowCodec):
    fmt = "webp"
    _description = "WebP (Pillow)"

    @property
    def name(self):
        return "WebP"


class BinaryCodec(Codec):
    """Subprocess codecs (reference ``codecs.py:246-414``)."""

    fmt = None

    @property
    def name(self):
        raise NotImplementedError()

    def _check_binaries(self, binaries):
        import shutil

        for b in binaries:
            if shutil.which(b) is None:
                raise RuntimeError(
                    f'Binary "{b}" not found in PATH; install it to bench {self.name}.'
                )

    def run(self, filepath, quality, metrics=None, return_rec=False):
        fd0, png_filepath = mkstemp(suffix=".png")
        fd1, out_filepath = mkstemp(suffix=self.fmt)
        try:
            encode_cmd = self._get_encode_cmd(filepath, quality, out_filepath)
            start = time.time()
            subprocess.run(encode_cmd, check=True, capture_output=True)
            enc_time = time.time() - start
            size = filesize(out_filepath)

            decode_cmd = self._get_decode_cmd(out_filepath, png_filepath)
            start = time.time()
            subprocess.run(decode_cmd, check=True, capture_output=True)
            dec_time = time.time() - start

            img = read_image(filepath)
            rec = read_image(png_filepath)
        finally:
            os.close(fd0)
            os.remove(png_filepath)
            os.close(fd1)
            os.remove(out_filepath)

        bpp_val = float(size) * 8 / (img.size[0] * img.size[1])
        out = _metrics(img, rec)
        out.update(
            {"bpp": bpp_val, "encoding_time": enc_time, "decoding_time": dec_time}
        )
        if return_rec:
            return out, rec
        return out

    def _get_encode_cmd(self, filepath, quality, out_filepath):
        raise NotImplementedError()

    def _get_decode_cmd(self, out_filepath, rec_filepath):
        raise NotImplementedError()


class JPEG2000(BinaryCodec):
    """ffmpeg-based JPEG2000 (reference ``codecs.py:246-300``)."""

    fmt = ".jp2"

    @property
    def name(self):
        return "JPEG2000"

    def _get_encode_cmd(self, filepath, quality, out_filepath):
        self._check_binaries(["ffmpeg"])
        return [
            "ffmpeg", "-loglevel", "panic", "-y", "-i", filepath,
            "-vcodec", "jpeg2000", "-pix_fmt", "yuv444p",
            "-c:v", "libopenjpeg", "-compression_level", str(quality),
            out_filepath,
        ]

    def _get_decode_cmd(self, out_filepath, rec_filepath):
        self._check_binaries(["ffmpeg"])
        return ["ffmpeg", "-loglevel", "panic", "-y", "-i", out_filepath, rec_filepath]


class BPG(BinaryCodec):
    """BPG (reference ``codecs.py:303-414``)."""

    fmt = ".bpg"

    def __init__(self, color_mode="ycbcr", encoder="x265", subsampling_mode="444",
                 bit_depth="8", encoder_path="bpgenc", decoder_path="bpgdec"):
        super().__init__()
        self.color_mode = color_mode
        self.encoder = encoder
        self.subsampling_mode = subsampling_mode
        self.bitdepth = bit_depth
        self.encoder_path = encoder_path
        self.decoder_path = decoder_path

    @property
    def name(self):
        return (
            f"BPG {self.bitdepth}b {self.subsampling_mode} {self.encoder} "
            f"{self.color_mode}"
        )

    def _get_encode_cmd(self, filepath, quality, out_filepath):
        self._check_binaries([self.encoder_path])
        if not 0 <= quality <= 51:
            raise ValueError(f"Invalid quality value: {quality} (0,51)")
        return [
            self.encoder_path, "-o", out_filepath, "-q", str(quality),
            "-f", self.subsampling_mode, "-e", self.encoder,
            "-c", self.color_mode, "-b", self.bitdepth, filepath,
        ]

    def _get_decode_cmd(self, out_filepath, rec_filepath):
        self._check_binaries([self.decoder_path])
        return [self.decoder_path, "-o", rec_filepath, out_filepath]


def _ver():  # pragma: no cover
    from PIL import __version__

    return __version__
