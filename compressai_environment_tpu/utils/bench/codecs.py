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

__all__ = [
    "Codec", "PillowCodec", "JPEG", "WebP", "BinaryCodec", "JPEG2000", "BPG",
    "TFCI", "RawYUVCodec", "VTM", "HM", "AV1",
]


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


class TFCI(BinaryCodec):
    """tensorflow/compression ``tfci.py`` wrapper (reference
    ``codecs.py:417-473``): shells out to the tfci script with a
    ``<model>-<quality>`` id. Quality range 1-8."""

    fmt = ".tfci"
    models = (
        "bmshj2018-factorized-mse",
        "bmshj2018-hyperprior-mse",
        "mbt2018-mean-mse",
    )

    def __init__(self, model="bmshj2018-factorized-mse", tfci_path="tfci.py"):
        super().__init__()
        self.model = model
        self.tfci_path = tfci_path

    @property
    def name(self):
        return f"{self.model}"

    @property
    def description(self):
        return "TFCI"

    def add_parser_args(self, parser):
        parser.add_argument("-m", "--model", choices=self.models,
                            default=self.models[0],
                            help="model architecture (default: %(default)s)")
        parser.add_argument("-p", "--path", dest="tfci_path", default="tfci.py",
                            help="tfci python script path")

    def set_args(self, args):
        self.model = getattr(args, "model", self.model)
        self.tfci_path = getattr(args, "tfci_path", self.tfci_path)

    def _get_encode_cmd(self, filepath, quality, out_filepath):
        if not 1 <= quality <= 8:
            raise ValueError(f"Invalid quality value: {quality} (1, 8)")
        return [
            sys.executable, self.tfci_path, "compress",
            f"{self.model}-{quality:d}", filepath, out_filepath,
        ]

    def _get_decode_cmd(self, out_filepath, rec_filepath):
        return [
            sys.executable, self.tfci_path, "decompress",
            out_filepath, rec_filepath,
        ]


class RawYUVCodec(Codec):
    """Shared raw-YUV444 pipeline for the reference-software codecs
    (VTM / HM / AV1 — reference ``codecs.py:494-900``).

    The input image is converted RGB -> BT.709 YCbCr (unless ``rgb=True``),
    written as a planar 8-bit YUV444 file, run through the external
    encoder/decoder pair, converted back, and scored against the source.
    Subclasses provide ``_encode_cmd`` / ``_decode_cmd``.
    """

    fmt = ".bin"
    rgb = False

    def set_args(self, args):
        self.rgb = getattr(args, "rgb", False)

    # -- hooks -------------------------------------------------------------
    def _encode_cmd(self, yuv_path, width, height, quality, out_filepath):
        raise NotImplementedError()

    def _decode_cmd(self, out_filepath, yuv_path):
        raise NotImplementedError()

    # -- pipeline ----------------------------------------------------------
    def _to_planar(self, img) -> np.ndarray:
        """HWC uint8 RGB -> planar (3, H, W) uint8, YCbCr unless rgb."""
        arr = np.asarray(img, np.uint8)
        if not self.rgb:
            from ...transforms.functional import rgb2ycbcr

            f = arr.astype(np.float32) / 255.0
            arr = np.round(np.clip(rgb2ycbcr(f), 0, 1) * 255.0).astype(np.uint8)
        return np.ascontiguousarray(arr.transpose(2, 0, 1))

    def _to_rgb(self, planar: np.ndarray) -> np.ndarray:
        """planar (3, H, W) uint8 -> HWC uint8 RGB."""
        arr = planar.transpose(1, 2, 0).astype(np.float32) / 255.0
        if not self.rgb:
            from ...transforms.functional import ycbcr2rgb

            arr = ycbcr2rgb(arr)
        return np.round(np.clip(arr, 0, 1) * 255.0).astype(np.uint8)

    def run(self, filepath, quality, metrics=None, return_rec=False):
        img = read_image(filepath)
        planar = self._to_planar(img)
        _, h, w = planar.shape

        fd, yuv_path = mkstemp(suffix=".yuv")
        out_filepath = os.path.splitext(yuv_path)[0] + self.fmt
        try:
            with open(yuv_path, "wb") as f:
                f.write(planar.tobytes())

            cmd = [str(c) for c in self._encode_cmd(
                yuv_path, w, h, quality, out_filepath
            )]
            start = time.time()
            subprocess.run(cmd, check=True, capture_output=True)
            enc_time = time.time() - start
            size = filesize(out_filepath)

            cmd = [str(c) for c in self._decode_cmd(out_filepath, yuv_path)]
            start = time.time()
            subprocess.run(cmd, check=True, capture_output=True)
            dec_time = time.time() - start

            rec_planar = np.fromfile(yuv_path, dtype=np.uint8)[
                : planar.size
            ].reshape(planar.shape)
        finally:
            os.close(fd)
            for p in (yuv_path, out_filepath):
                if os.path.exists(p):
                    os.remove(p)

        rec = self._to_rgb(rec_planar)
        out = _metrics(img, rec)
        out.update({
            "bpp": float(size) * 8 / (h * w),
            "encoding_time": enc_time,
            "decoding_time": dec_time,
        })
        if return_rec:
            return out, rec
        return out


class VTM(RawYUVCodec):
    """VTM (VVC reference software) wrapper (reference ``codecs.py:494-634``).
    Quality = QP in [0, 63]."""

    fmt = ".bin"

    def __init__(self, build_dir="", config="", rgb=False):
        super().__init__()
        self.build_dir = build_dir
        self.config = config
        self.rgb = rgb

    @property
    def name(self):
        return "VTM"

    @property
    def description(self):
        return "VTM"

    def add_parser_args(self, parser):
        parser.add_argument("-b", "--build-dir", dest="build_dir", default="",
                            help="VTM build dir")
        parser.add_argument("-c", "--config", default="", help="VTM config file")
        parser.add_argument("--rgb", action="store_true",
                            help="Use RGB color space (over YCbCr)")

    def set_args(self, args):
        super().set_args(args)
        self.build_dir = getattr(args, "build_dir", self.build_dir)
        self.config = getattr(args, "config", self.config)

    @property
    def encoder_path(self):
        elf = {"Linux": "EncoderAppStatic", "Darwin": "EncoderApp"}
        return os.path.join(self.build_dir, elf.get(platform.system(), "EncoderAppStatic"))

    @property
    def decoder_path(self):
        elf = {"Linux": "DecoderAppStatic", "Darwin": "DecoderApp"}
        return os.path.join(self.build_dir, elf.get(platform.system(), "DecoderAppStatic"))

    def _encode_cmd(self, yuv_path, width, height, quality, out_filepath):
        if not 0 <= quality <= 63:
            raise ValueError(f"Invalid quality value: {quality} (0,63)")
        cmd = [
            self.encoder_path, "-i", yuv_path, "-c", self.config,
            "-q", quality, "-o", "/dev/null", "-b", out_filepath,
            "-wdt", width, "-hgt", height, "-fr", "1", "-f", "1",
            "--InputChromaFormat=444", "--InputBitDepth=8",
            "--ConformanceWindowMode=1",
        ]
        if self.rgb:
            cmd += [
                "--InputColourSpaceConvert=RGBtoGBR",
                "--SNRInternalColourSpace=1",
                "--OutputInternalColourSpace=0",
            ]
        return cmd

    def _decode_cmd(self, out_filepath, yuv_path):
        cmd = [self.decoder_path, "-b", out_filepath, "-o", yuv_path, "-d", 8]
        if self.rgb:
            cmd.append("--OutputInternalColourSpace=GBRtoRGB")
        return cmd


class HM(RawYUVCodec):
    """HM (H.265/HEVC reference software) wrapper (reference
    ``codecs.py:637-774``). Quality = QP in [0, 51]."""

    fmt = ".bin"

    def __init__(self, build_dir="", config="", rgb=False):
        super().__init__()
        self.build_dir = build_dir
        self.config = config
        self.rgb = rgb

    @property
    def name(self):
        return "HM"

    @property
    def description(self):
        return "HM"

    def add_parser_args(self, parser):
        parser.add_argument("-b", "--build-dir", dest="build_dir", default="",
                            help="HM build dir")
        parser.add_argument("-c", "--config", default="", help="HM config file")
        parser.add_argument("--rgb", action="store_true",
                            help="Use RGB color space (over YCbCr)")

    def set_args(self, args):
        super().set_args(args)
        self.build_dir = getattr(args, "build_dir", self.build_dir)
        self.config = getattr(args, "config", self.config)

    def _encode_cmd(self, yuv_path, width, height, quality, out_filepath):
        if not 0 <= quality <= 51:
            raise ValueError(f"Invalid quality value: {quality} (0,51)")
        cmd = [
            os.path.join(self.build_dir, "TAppEncoderStatic"),
            "-i", yuv_path, "-c", self.config, "-q", quality,
            "-o", "/dev/null", "-b", out_filepath,
            "-wdt", width, "-hgt", height, "-fr", "1", "-f", "1",
            "--InputChromaFormat=444", "--InputBitDepth=8",
            "--SEIDecodedPictureHash", "--Level=5.1",
            "--CUNoSplitIntraACT=0", "--ConformanceMode=1",
        ]
        if self.rgb:
            cmd += [
                "--InputColourSpaceConvert=RGBtoGBR",
                "--SNRInternalColourSpace=1",
                "--OutputInternalColourSpace=0",
            ]
        return cmd

    def _decode_cmd(self, out_filepath, yuv_path):
        cmd = [
            os.path.join(self.build_dir, "TAppDecoderStatic"),
            "-b", out_filepath, "-o", yuv_path, "-d", 8,
        ]
        if self.rgb:
            cmd.append("--OutputInternalColourSpace=GBRtoRGB")
        return cmd


class AV1(RawYUVCodec):
    """AV1 (AOM reference software) wrapper (reference ``codecs.py:777-900``).
    Quality = cq-level in [0, 63]; always YCbCr."""

    fmt = ".webm"

    def __init__(self, build_dir=""):
        super().__init__()
        self.build_dir = build_dir

    @property
    def name(self):
        return "AV1"

    @property
    def description(self):
        return "AV1"

    def add_parser_args(self, parser):
        parser.add_argument("-b", "--build-dir", dest="build_dir", default="",
                            help="AOM binaries dir")

    def set_args(self, args):
        self.build_dir = getattr(args, "build_dir", self.build_dir)

    def _encode_cmd(self, yuv_path, width, height, quality, out_filepath):
        if not 0 <= quality <= 63:
            raise ValueError(f"Invalid quality value: {quality} (0,63)")
        return [
            os.path.join(self.build_dir, "aomenc"),
            "-w", width, "-h", height, "--fps=1/1", "--limit=1",
            "--input-bit-depth=8", "--cpu-used=0", "--threads=1",
            "--passes=2", "--end-usage=q", f"--cq-level={quality}",
            "--i444", "--skip=0", "--tune=psnr", "--psnr", "--bit-depth=8",
            "-o", out_filepath, yuv_path,
        ]

    def _decode_cmd(self, out_filepath, yuv_path):
        return [
            os.path.join(self.build_dir, "aomdec"), out_filepath,
            "-o", yuv_path, "--rawvideo", "--output-bit-depth=8",
        ]


def _ver():  # pragma: no cover
    from PIL import __version__

    return __version__
