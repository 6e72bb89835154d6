"""Transforms + datasets tests, with torch interpolate as the numerical
oracle for the chroma up/downsampling paths."""

import numpy as np
import pytest

from compressai_environment_tpu.transforms import (
    rgb2ycbcr,
    ycbcr2rgb,
    yuv_420_to_444,
    yuv_444_to_420,
)
from compressai_environment_tpu.datasets import (
    RawVideoSequence,
    VideoFormat,
    get_raw_video_file_info,
)

torch = pytest.importorskip("torch")


class TestColor:
    def test_rgb_ycbcr_roundtrip(self, rng):
        rgb = rng.random((2, 16, 16, 3)).astype(np.float32)
        out = ycbcr2rgb(rgb2ycbcr(rgb))
        np.testing.assert_allclose(out, rgb, atol=1e-5)

    def test_matches_torch_reference_formula(self, rng):
        rgb = rng.random((16, 16, 3)).astype(np.float32)
        y = rgb2ycbcr(rgb)
        Kr, Kg, Kb = 0.2126, 0.7152, 0.0722
        np.testing.assert_allclose(
            y[..., 0], Kr * rgb[..., 0] + Kg * rgb[..., 1] + Kb * rgb[..., 2],
            atol=1e-6,
        )

    def test_invalid_shape(self):
        with pytest.raises(ValueError):
            rgb2ycbcr(np.zeros((4, 4, 4), np.float32))


class TestSubsampling:
    def test_444_to_420_avg_pool(self, rng):
        yuv = rng.random((1, 8, 8, 3)).astype(np.float32)
        y, u, v = yuv_444_to_420(yuv)
        assert y.shape == (1, 8, 8) and u.shape == (1, 4, 4)
        tu = torch.nn.functional.avg_pool2d(
            torch.from_numpy(yuv[..., 1])[:, None], 2, 2
        ).numpy()[:, 0]
        np.testing.assert_allclose(u, tu, atol=1e-6)

    @pytest.mark.parametrize("mode", ["bilinear", "bicubic", "nearest"])
    def test_420_to_444_matches_torch(self, rng, mode):
        y = rng.random((1, 8, 8)).astype(np.float32)
        u = rng.random((1, 4, 4)).astype(np.float32)
        v = rng.random((1, 4, 4)).astype(np.float32)
        out = yuv_420_to_444((y, u, v), mode=mode)
        kwargs = {} if mode == "nearest" else {"align_corners": False}
        tu = torch.nn.functional.interpolate(
            torch.from_numpy(u)[:, None], scale_factor=2, mode=mode, **kwargs
        ).numpy()[:, 0]
        np.testing.assert_allclose(out[..., 1], tu, atol=1e-5)

    def test_upsample_invalid_mode(self):
        with pytest.raises(ValueError):
            yuv_420_to_444((np.zeros((2, 2)),) * 3, mode="box")


class TestRawVideo:
    def test_filename_parsing(self):
        info = get_raw_video_file_info("Foo_1280x720_50Hz_8bit_P420.yuv")
        assert info["width"] == 1280 and info["height"] == 720
        assert info["bitdepth"] == 8
        assert info["format"] == VideoFormat.YUV420
        assert float(info["framerate"]) == 50.0

    def test_ffmpeg_style(self):
        info = get_raw_video_file_info("clip_640x480_yuv420p10le.yuv")
        assert info["format"] == VideoFormat.YUV420
        assert info["bitdepth"] == 10
        assert info["endianness"] == "le"

    def test_memmap_roundtrip(self, tmp_path, rng):
        w, h, frames = 16, 8, 3
        ysize, csize = w * h, (w // 2) * (h // 2)
        data = rng.integers(0, 255, size=frames * (ysize + 2 * csize), dtype=np.uint8)
        path = tmp_path / f"test_{w}x{h}_25Hz_8bit_P420.yuv"
        data.tofile(path)

        seq = RawVideoSequence.from_file(str(path))
        assert seq.total_frms == frames
        assert seq.width == w and seq.height == h
        frame = seq[0]
        assert frame["y"].shape == (h, w)
        assert frame["u"].shape == (h // 2, w // 2)
        np.testing.assert_array_equal(
            frame["y"].ravel(), data[:ysize]
        )
