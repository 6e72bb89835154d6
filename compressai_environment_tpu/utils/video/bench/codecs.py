"""Classical video codec wrappers for benchmarking
(reference ``utils/video/bench/codecs.py``).

x264/x265 go through ffmpeg; VTM/HM wrap the reference-software binaries with
low-delay configs. All shell out and raise a clear error when the binary is
missing (none ship in this container).
"""

from __future__ import annotations

import shutil
import subprocess
import time
from pathlib import Path
from tempfile import mkstemp

import numpy as np

__all__ = ["Codec", "x264", "x265", "VTM", "HM"]


def _check_binary(name):
    if shutil.which(name) is None:
        raise RuntimeError(f'Binary "{name}" not found in PATH.')


class Codec:
    """Encode a raw YUV sequence at a given qp; returns metrics dict."""

    name = ""
    description = ""

    def __init__(self, binpath=None, **kwargs):
        self.binpath = binpath

    def get_encode_cmd(self, video, qp, out):
        raise NotImplementedError

    def get_decode_cmd(self, out, rec_yuv, video):
        raise NotImplementedError

    def run(self, video, qp, keep_bitstream=False):
        """video: a RawVideoSequence-compatible path (Vooya-style name)."""
        from ....datasets.rawvideo import RawVideoSequence

        org = RawVideoSequence.from_file(str(video))
        fd, out = mkstemp(suffix=self.bitstream_suffix)
        fd2, rec = mkstemp(suffix=".yuv")
        try:
            start = time.time()
            subprocess.run(self.get_encode_cmd(org, qp, out), check=True,
                           capture_output=True)
            enc_time = time.time() - start
            size = Path(out).stat().st_size

            start = time.time()
            subprocess.run(self.get_decode_cmd(out, rec, org), check=True,
                           capture_output=True)
            dec_time = time.time() - start

            rec_seq = RawVideoSequence.new_like(org, rec)
            metrics = self._metrics(org, rec_seq)
            rec_seq.close()
        finally:
            import os

            os.close(fd)
            os.close(fd2)
            Path(rec).unlink(missing_ok=True)
            if not keep_bitstream:
                Path(out).unlink(missing_ok=True)

        n = org.total_frms
        metrics["bpp"] = size * 8 / (org.width * org.height * n)
        if org.framerate:
            metrics["bitrate"] = size * 8 * float(org.framerate) / (n * 1000)
        metrics["encoding_time"] = enc_time
        metrics["decoding_time"] = dec_time
        org.close()
        return metrics

    bitstream_suffix = ".bin"

    @staticmethod
    def _metrics(org, rec):
        from ....utils.metrics import psnr

        max_val = 2**org.bitdepth - 1
        vals = {"psnr-y": [], "psnr-u": [], "psnr-v": []}
        n = min(org.total_frms, rec.total_frms)
        for i in range(n):
            for c in ("y", "u", "v"):
                a = np.asarray(org[i][c], np.float32) / max_val
                b = np.asarray(rec[i][c], np.float32) / max_val
                vals[f"psnr-{c}"].append(psnr(a, b, 1.0))
        out = {k: float(np.mean(v)) for k, v in vals.items()}
        out["psnr-yuv"] = (4 * out["psnr-y"] + out["psnr-u"] + out["psnr-v"]) / 6
        return out


class x264(Codec):
    name = "x264"
    description = "x264 medium tune zerolatency (ffmpeg)"
    bitstream_suffix = ".mp4"

    def get_encode_cmd(self, org, qp, out):
        _check_binary("ffmpeg")
        return [
            "ffmpeg", "-y", "-loglevel", "panic",
            "-s:v", f"{org.width}x{org.height}",
            "-i", str(org._path),
            "-c:v", "libx264", "-crf", str(qp), "-preset", "medium",
            "-bf", "0", "-tune", "zerolatency", "-pix_fmt", "yuv420p",
            "-threads", "4", out,
        ]

    def get_decode_cmd(self, out, rec_yuv, org):
        _check_binary("ffmpeg")
        return ["ffmpeg", "-y", "-loglevel", "panic", "-i", out,
                "-pix_fmt", "yuv420p", rec_yuv]


class x265(x264):
    name = "x265"
    description = "x265 medium tune zerolatency (ffmpeg)"

    def get_encode_cmd(self, org, qp, out):
        cmd = super().get_encode_cmd(org, qp, out)
        cmd[cmd.index("libx264")] = "libx265"
        i = cmd.index("-tune")
        cmd[i : i + 2] = ["-x265-params", f"crf={qp}:keyint=-1:min-keyint=-1"]
        return cmd


class VTM(Codec):
    name = "VTM"
    description = "VTM reference software, low-delay"
    bitstream_suffix = ".bin"

    def __init__(self, binpath="EncoderAppStatic", decpath="DecoderAppStatic",
                 config=None, **kwargs):
        super().__init__()
        self.encoder = binpath
        self.decoder = decpath
        self.config = config

    def get_encode_cmd(self, org, qp, out):
        _check_binary(self.encoder)
        if self.config is None:
            raise RuntimeError("VTM requires a low-delay config file (-c).")
        return [
            self.encoder, "-i", str(org._path), "-c", self.config,
            "-q", str(qp), "-o", "/dev/null", "-b", out,
            "-wdt", str(org.width), "-hgt", str(org.height),
            "-fr", str(float(org.framerate or 30)), "-f", str(org.total_frms),
            f"--InputBitDepth={org.bitdepth}",
        ]

    def get_decode_cmd(self, out, rec_yuv, org):
        _check_binary(self.decoder)
        return [self.decoder, "-b", out, "-o", rec_yuv,
                f"--OutputBitDepth={org.bitdepth}"]


class HM(VTM):
    name = "HM"
    description = "HM reference software, low-delay"

    def __init__(self, binpath="TAppEncoderStatic", decpath="TAppDecoderStatic",
                 config=None, **kwargs):
        super().__init__(binpath, decpath, config)
