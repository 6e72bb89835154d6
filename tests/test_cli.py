"""CLI integration tests: update_model export, eval_model JSON schema, and
codec.py file-format round trip (reference test pattern:
tests/test_eval_model.py, tests/test_codec.py)."""

import json
import math
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("dataset")
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.random((192, 256, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / f"img{i}.png")
    return root


@pytest.fixture(scope="module")
def exported_checkpoint(tmp_path_factory):
    """A random-init bmshj2018-factorized exported with baked tables."""
    out = tmp_path_factory.mktemp("ckpt")
    import jax

    from compressai_environment_tpu.models import FactorizedPrior
    from compressai_environment_tpu.utils.checkpoint import save_checkpoint

    m = FactorizedPrior(32, 48).init(key=jax.random.key(0))
    m.update(force=True)
    path = out / "fp.bin"
    save_checkpoint(m, path, architecture="bmshj2018-factorized")
    return path


def test_checkpoint_roundtrip(exported_checkpoint):
    from compressai_environment_tpu.models import FactorizedPrior
    from compressai_environment_tpu.utils.checkpoint import restore_into

    m = FactorizedPrior(32, 48)
    restore_into(m, exported_checkpoint)
    assert "y" in m.tables
    x = np.random.default_rng(1).random((1, 64, 64, 3), dtype=np.float32)
    c = m.compress(x)
    d = m.decompress(c["strings"], c["shape"])
    assert d["x_hat"].shape == (1, 64, 64, 3)


def test_update_model_cli(exported_checkpoint, tmp_path):
    from compressai_environment_tpu.utils.update_model.__main__ import main

    # quality must match the (32, 48) channels? update_model builds from the
    # architecture cfg; for the native path it restores sizes from the file,
    # so use the native restore branch which rebuilds params from the tree.
    # Here we only check the CLI runs and produces a sha-suffixed file.
    with pytest.raises(SystemExit) if False else _noraise():
        main([
            "-a", "bmshj2018-factorized", "-n", "exported",
            "-d", str(tmp_path), "-q", "1", "--no-update",
            str(exported_checkpoint),
        ])
    outputs = list(tmp_path.glob("exported-*.bin"))
    assert len(outputs) == 1


class _noraise:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_eval_model_entropy_estimation(fake_dataset, exported_checkpoint, capsys):
    from compressai_environment_tpu.utils.eval_model.__main__ import main

    main([
        "checkpoint", str(fake_dataset),
        "-a", "bmshj2018-factorized",
        "--entropy-estimation",
        "-p", str(exported_checkpoint),
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["name"] == "bmshj2018-factorized"
    assert set(out["results"]) >= {"psnr", "ms-ssim", "bpp", "encoding_time", "decoding_time"}
    assert len(out["results"]["psnr"]) == 1
    assert out["results"]["bpp"][0] > 0


def test_eval_model_real_coding(fake_dataset, exported_checkpoint, capsys):
    from compressai_environment_tpu.utils.eval_model.__main__ import main

    main([
        "checkpoint", str(fake_dataset),
        "-a", "bmshj2018-factorized",
        "-p", str(exported_checkpoint),
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["results"]["bpp"][0] > 0
    assert out["description"] == "Inference (ans)"


def test_eval_model_half(fake_dataset, exported_checkpoint, capsys):
    """--half (bfloat16 transforms; reference fp16 --half at
    eval_model/__main__.py:174-176) must produce a sane report."""
    from compressai_environment_tpu.utils.eval_model.__main__ import main

    main([
        "checkpoint", str(fake_dataset),
        "-a", "bmshj2018-factorized",
        "--half",
        "-p", str(exported_checkpoint),
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["results"]["bpp"][0] > 0
    assert math.isfinite(out["results"]["psnr"][0])


def test_codec_cli_roundtrip(fake_dataset, exported_checkpoint, tmp_path):
    """encode -> decode through the binary container; md5-stable."""
    import hashlib
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "codec_example", REPO / "examples" / "codec.py"
    )
    codec = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(codec)

    img = sorted(fake_dataset.iterdir())[0]
    bin_path = tmp_path / "out.bin"
    png_path = tmp_path / "dec.png"

    codec.main([
        "encode", str(img), "-o", str(bin_path),
        "-m", "bmshj2018-factorized", "-q", "1",
        "--checkpoint", str(exported_checkpoint),
    ])
    assert bin_path.stat().st_size > 10

    codec.main([
        "decode", str(bin_path), "-o", str(png_path),
        "--checkpoint", str(exported_checkpoint),
    ])
    assert png_path.exists()

    # determinism: encoding again produces identical bytes
    bin2 = tmp_path / "out2.bin"
    codec.main([
        "encode", str(img), "-o", str(bin2),
        "-m", "bmshj2018-factorized", "-q", "1",
        "--checkpoint", str(exported_checkpoint),
    ])
    assert hashlib.md5(bin_path.read_bytes()).hexdigest() == \
        hashlib.md5(bin2.read_bytes()).hexdigest()


def test_codec_cli_video_roundtrip(tmp_path):
    """ssf2020 video encode/decode through the binary container."""
    import importlib.util

    import jax

    from compressai_environment_tpu.models.video import ScaleSpaceFlow
    from compressai_environment_tpu.utils.checkpoint import save_checkpoint

    m = ScaleSpaceFlow().init(key=jax.random.key(0), input_shape=(1, 128, 128, 3))
    m.update(force=True)
    ckpt = tmp_path / "ssf.msgpack"
    save_checkpoint(m, ckpt, architecture="ssf2020")

    # 2-frame 128x128 YUV420 clip
    rng = np.random.default_rng(0)
    w = h = 128
    data = []
    for _ in range(2):
        data.append(np.kron(rng.integers(40, 215, (h // 8, w // 8)),
                            np.ones((8, 8))).astype(np.uint8).ravel())
        data.append(np.kron(rng.integers(100, 155, (h // 16, w // 16)),
                            np.ones((8, 8))).astype(np.uint8).ravel())
        data.append(np.kron(rng.integers(100, 155, (h // 16, w // 16)),
                            np.ones((8, 8))).astype(np.uint8).ravel())
    clip = tmp_path / f"clip_{w}x{h}_25Hz_8bit_P420.yuv"
    np.concatenate(data).tofile(clip)

    spec = importlib.util.spec_from_file_location(
        "codec_example", REPO / "examples" / "codec.py"
    )
    codec = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(codec)

    bin_path = tmp_path / "vid.bin"
    out_yuv = tmp_path / "dec.yuv"
    codec.main([
        "encode", str(clip), "-o", str(bin_path), "-m", "ssf2020",
        "-q", "1", "--checkpoint", str(ckpt),
    ])
    assert bin_path.stat().st_size > 10
    codec.main([
        "decode", str(bin_path), "-o", str(out_yuv), "--checkpoint", str(ckpt),
    ])
    # decoded file has same size as the original clip
    assert out_yuv.stat().st_size == clip.stat().st_size
