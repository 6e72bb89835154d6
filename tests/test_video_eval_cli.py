"""Video eval CLI test: synthesize a tiny YUV420 clip, evaluate a
random-init ssf2020 through real coding, check the JSON schema."""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def yuv_clip(tmp_path_factory):
    root = tmp_path_factory.mktemp("video")
    w, h, frames = 128, 128, 2
    rng = np.random.default_rng(0)
    ysize, csize = w * h, (w // 2) * (h // 2)
    # smooth content
    data = []
    for _ in range(frames):
        y = np.kron(rng.integers(40, 215, (h // 8, w // 8)), np.ones((8, 8))).astype(np.uint8)
        u = np.kron(rng.integers(100, 155, (h // 16, w // 16)), np.ones((8, 8))).astype(np.uint8)
        v = np.kron(rng.integers(100, 155, (h // 16, w // 16)), np.ones((8, 8))).astype(np.uint8)
        data += [y.ravel(), u.ravel(), v.ravel()]
    np.concatenate(data).tofile(root / f"clip_{w}x{h}_25Hz_8bit_P420.yuv")
    return root


@pytest.fixture(scope="module")
def ssf_checkpoint(tmp_path_factory):
    import jax

    from compressai_environment_tpu.models.video import ScaleSpaceFlow
    from compressai_environment_tpu.utils.checkpoint import save_checkpoint

    out = tmp_path_factory.mktemp("ssf_ckpt")
    m = ScaleSpaceFlow().init(key=jax.random.key(0), input_shape=(1, 128, 128, 3))
    m.update(force=True)
    path = out / "ssf.msgpack"
    save_checkpoint(m, path, architecture="ssf2020")
    return path


def test_video_eval_real_coding(yuv_clip, ssf_checkpoint, capsys):
    from compressai_environment_tpu.utils.video.eval_model.__main__ import main

    main([
        "checkpoint", str(yuv_clip), "-p", str(ssf_checkpoint),
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["name"] == "ssf2020"
    res = out["results"]
    for k in ("psnr-y", "psnr-u", "psnr-v", "psnr-yuv", "psnr-rgb",
              "ms-ssim-rgb", "bpp", "bitrate", "encoding_time", "decoding_time"):
        assert k in res, k
    assert res["bpp"][0] > 0
    assert res["bitrate"][0] > 0
    # psnr-yuv is the 4:1:1 weighted mean
    np.testing.assert_allclose(
        res["psnr-yuv"][0],
        (4 * res["psnr-y"][0] + res["psnr-u"][0] + res["psnr-v"][0]) / 6,
        rtol=1e-6,
    )


def test_video_eval_entropy_estimation(yuv_clip, ssf_checkpoint, capsys):
    from compressai_environment_tpu.utils.video.eval_model.__main__ import main

    main([
        "checkpoint", str(yuv_clip), "-p", str(ssf_checkpoint),
        "--entropy-estimation",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["results"]["bpp"][0] > 0
