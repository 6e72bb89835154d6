"""Classical-codec bench / find_close / plot CLI tests (reference pattern:
tests/test_bench_codec.py)."""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth-ish image so JPEG behaves reasonably
    for i in range(2):
        arr = np.kron(
            (rng.random((24, 32, 3)) * 255).astype(np.uint8), np.ones((8, 8, 1), np.uint8)
        )
        Image.fromarray(arr).save(root / f"img{i}.png")
    return root


def test_jpeg_bench(image_dir, capsys):
    from compressai_environment_tpu.utils.bench.__main__ import main

    main(["jpeg", str(image_dir), "-q", "20", "80"])
    out = json.loads(capsys.readouterr().out)
    assert out["name"] == "JPEG"
    assert len(out["results"]["bpp"]) == 2
    # higher quality -> higher bpp and psnr
    assert out["results"]["bpp"][1] > out["results"]["bpp"][0]
    assert out["results"]["psnr"][1] > out["results"]["psnr"][0]


def test_webp_bench(image_dir, capsys):
    from compressai_environment_tpu.utils.bench.__main__ import main

    main(["webp", str(image_dir), "-q", "50"])
    out = json.loads(capsys.readouterr().out)
    assert out["results"]["bpp"][0] > 0


def test_find_close_bpp(image_dir, capsys):
    from compressai_environment_tpu.utils.find_close.__main__ import main

    img = sorted(image_dir.iterdir())[0]
    main(["jpeg", str(img), "1.0", "-m", "bpp"])
    out = json.loads(capsys.readouterr().out)
    assert 0 <= out["quality"] <= 100
    assert abs(out["results"]["bpp"] - 1.0) < 1.0


def test_plot_cli(image_dir, tmp_path, capsys):
    from compressai_environment_tpu.utils.bench.__main__ import main as bench_main
    from compressai_environment_tpu.utils.plot.__main__ import main as plot_main

    bench_main(["jpeg", str(image_dir), "-q", "20", "50", "80"])
    results = json.loads(capsys.readouterr().out)
    f = tmp_path / "jpeg.json"
    f.write_text(json.dumps(results))

    out_png = tmp_path / "plot.png"
    plot_main(["-f", str(f), "-m", "psnr", "-o", str(out_png)])
    assert out_png.exists() and out_png.stat().st_size > 0
