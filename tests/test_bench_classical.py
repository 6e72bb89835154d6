"""Classical-codec bench wrappers: command construction and pipeline
mechanics for the external-binary codecs (TFCI, VTM, HM, AV1), exercised
with a mocked ``subprocess.run`` since the binaries aren't shipped
(reference surface: ``utils/bench/codecs.py:417-900``)."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from compressai_environment_tpu.utils.bench import __main__ as bench_main
from compressai_environment_tpu.utils.bench.codecs import AV1, HM, TFCI, VTM
from compressai_environment_tpu.utils.find_close.__main__ import (
    get_codec_q_bounds,
)


@pytest.fixture()
def png(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    return str(p)


class FakeRun:
    """Stands in for subprocess.run: records commands, simulates an
    encoder (writes the bitstream file, stashes the yuv/png input) and a
    decoder (writes the stashed content back)."""

    def __init__(self, fmt):
        self.fmt = fmt
        self.cmds = []
        self._stash = None
        self._src = None

    def __call__(self, cmd, check=True, capture_output=True):
        cmd = [str(c) for c in cmd]
        self.cmds.append(cmd)
        is_encode = len(self.cmds) % 2 == 1
        if is_encode:
            for a in cmd:
                if a.endswith(".yuv") and Path(a).exists():
                    self._stash = Path(a).read_bytes()
                if a.endswith((".png", ".ppm")) and Path(a).exists():
                    self._src = Path(a).read_bytes()
            out = next(a for a in cmd if a.endswith(self.fmt))
            Path(out).write_bytes(b"\x00" * 100)
        else:
            for a in cmd:
                if a.endswith(".yuv"):
                    Path(a).write_bytes(self._stash)
                elif a.endswith(".png") and not Path(a).exists() or (
                    a.endswith(".png") and Path(a).stat().st_size == 0
                ):
                    Path(a).write_bytes(self._src)
        return subprocess.CompletedProcess(cmd, 0, b"", b"")


@pytest.mark.parametrize(
    "cls,kwargs,q,flags",
    [
        (VTM, {"build_dir": "/opt/vtm/bin", "config": "encoder.cfg"}, 37,
         ["--InputChromaFormat=444", "--ConformanceWindowMode=1", "-c"]),
        (HM, {"build_dir": "/opt/hm/bin", "config": "encoder.cfg"}, 32,
         ["--SEIDecodedPictureHash", "--Level=5.1", "--ConformanceMode=1"]),
        (AV1, {"build_dir": "/opt/aom"}, 40,
         ["--i444", "--end-usage=q", "--cq-level=40", "--tune=psnr"]),
    ],
)
def test_yuv_codec_pipeline(monkeypatch, png, cls, kwargs, q, flags):
    codec = cls(**kwargs)
    fake = FakeRun(codec.fmt)
    monkeypatch.setattr(subprocess, "run", fake)

    out = codec.run(png, q)
    assert len(fake.cmds) == 2
    enc = fake.cmds[0]
    for f in flags:
        assert f in enc, f"{cls.__name__}: missing {f} in {enc}"
    assert enc[0].startswith(kwargs["build_dir"])
    # metrics contract
    for k in ("bpp", "psnr", "ms-ssim", "encoding_time", "decoding_time"):
        assert k in out
    assert out["bpp"] == pytest.approx(100 * 8 / (32 * 48))
    # lossless fake round trip -> perfect psnr clamp territory
    assert out["psnr"] > 40


def test_yuv_codec_quality_bounds(png):
    with pytest.raises(ValueError):
        VTM(build_dir="x", config="c")._encode_cmd("a.yuv", 8, 8, 64, "o.bin")
    with pytest.raises(ValueError):
        HM(build_dir="x", config="c")._encode_cmd("a.yuv", 8, 8, 52, "o.bin")
    with pytest.raises(ValueError):
        AV1(build_dir="x")._encode_cmd("a.yuv", 8, 8, -1, "o.webm")


def test_tfci_command_construction(monkeypatch, png):
    codec = TFCI(model="mbt2018-mean-mse", tfci_path="/opt/tfci.py")
    fake = FakeRun(".tfci")
    monkeypatch.setattr(subprocess, "run", fake)

    out = codec.run(png, 4)
    enc, dec = fake.cmds
    assert enc[1:4] == ["/opt/tfci.py", "compress", "mbt2018-mean-mse-4"]
    assert dec[2] == "decompress"
    assert out["bpp"] > 0
    with pytest.raises(ValueError):
        codec.run(png, 9)


def test_bench_parser_lists_all_codecs():
    parser = bench_main.setup_parser()
    sub = next(
        a for a in parser._actions
        if isinstance(a, type(parser._subparsers._group_actions[0]))
    )
    names = set(sub.choices)
    assert {"jpeg", "webp", "jpeg2000", "bpg", "tfci", "vtm", "hm", "av1"} <= names


def test_find_close_bounds_cover_new_codecs():
    assert get_codec_q_bounds(VTM()) == (0, 63, True)
    assert get_codec_q_bounds(HM()) == (0, 51, True)
    assert get_codec_q_bounds(AV1()) == (0, 63, True)
    assert get_codec_q_bounds(TFCI()) == (1, 8, False)
