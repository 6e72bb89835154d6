"""Color-space and chroma-subsampling transforms (numpy, channel-last).

Behavioral match of reference ``compressai/transforms/functional.py``:
BT.709 RGB<->YCbCr, 444->420 via 2x2 average pooling, 420->444 via
bilinear / bicubic / nearest upsampling with torch ``F.interpolate``
semantics (half-pixel centers, ``align_corners=False``, edge clamping,
bicubic a = -0.75).

These run on host as part of data loading / evaluation; the shapes are
(..., H, W) per plane or (..., H, W, 3) packed.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "YCBCR_WEIGHTS",
    "rgb2ycbcr",
    "ycbcr2rgb",
    "yuv_444_to_420",
    "yuv_420_to_444",
]

YCBCR_WEIGHTS = {
    # Spec: (K_r, K_g, K_b) with K_g = 1 - K_r - K_b
    "ITU-R_BT.709": (0.2126, 0.7152, 0.0722)
}


def _check(x):
    x = np.asarray(x)
    if x.shape[-1] != 3 or x.ndim not in (3, 4) or not np.issubdtype(
        x.dtype, np.floating
    ):
        raise ValueError(
            "Expected a 3D or 4D floating tensor with shape (NxHxWx3) or (HxWx3)"
        )
    return x


def rgb2ycbcr(rgb: np.ndarray) -> np.ndarray:
    """RGB -> YCbCr, ITU-R BT.709 (reference ``functional.py:26-44``)."""
    rgb = _check(rgb)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    Kr, Kg, Kb = YCBCR_WEIGHTS["ITU-R_BT.709"]
    y = Kr * r + Kg * g + Kb * b
    cb = 0.5 * (b - y) / (1 - Kb) + 0.5
    cr = 0.5 * (r - y) / (1 - Kr) + 0.5
    return np.stack((y, cb, cr), axis=-1).astype(rgb.dtype)


def ycbcr2rgb(ycbcr: np.ndarray) -> np.ndarray:
    """YCbCr -> RGB, ITU-R BT.709 (reference ``functional.py:47-65``)."""
    ycbcr = _check(ycbcr)
    y, cb, cr = ycbcr[..., 0], ycbcr[..., 1], ycbcr[..., 2]
    Kr, Kg, Kb = YCBCR_WEIGHTS["ITU-R_BT.709"]
    r = y + (2 - 2 * Kr) * (cr - 0.5)
    b = y + (2 - 2 * Kb) * (cb - 0.5)
    g = (y - Kr * r - Kb * b) / Kg
    return np.stack((r, g, b), axis=-1).astype(ycbcr.dtype)


def _avg_pool2(x: np.ndarray) -> np.ndarray:
    """2x2 average pooling over the last two axes (torch avg_pool2d k=2 s=2)."""
    h, w = x.shape[-2], x.shape[-1]
    x = x[..., : h - h % 2, : w - w % 2]
    return 0.25 * (
        x[..., 0::2, 0::2] + x[..., 0::2, 1::2] + x[..., 1::2, 0::2] + x[..., 1::2, 1::2]
    )


def yuv_444_to_420(yuv, mode: str = "avg_pool"):
    """(y, u, v) planes (..., H, W) or packed (..., H, W, 3) -> 420 tuple
    (reference ``functional.py:68-98``)."""
    if mode not in ("avg_pool",):
        raise ValueError(f'Invalid downsampling mode "{mode}".')
    if isinstance(yuv, np.ndarray) and yuv.shape[-1] == 3:
        y, u, v = yuv[..., 0], yuv[..., 1], yuv[..., 2]
    else:
        y, u, v = yuv
    return (np.asarray(y), _avg_pool2(np.asarray(u)), _avg_pool2(np.asarray(v)))


def _cubic_weights(d: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic kernel, torch's a = -0.75."""
    d = np.abs(d)
    w = np.where(
        d <= 1,
        (a + 2) * d**3 - (a + 3) * d**2 + 1,
        np.where(d < 2, a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a, 0.0),
    )
    return w


def _upsample2_axis(x: np.ndarray, axis: int, mode: str) -> np.ndarray:
    """Upsample one axis by 2 with half-pixel centers + edge clamping."""
    n = x.shape[axis]
    x = np.moveaxis(x, axis, -1)

    if mode == "nearest":
        out = np.repeat(x, 2, axis=-1)
        return np.moveaxis(out, -1, axis)

    # output j maps to input coordinate j/2 - 0.25: phases -0.25 (even j)
    # and +0.25 (odd j) around base index i = j // 2.
    if mode == "bilinear":
        offsets = np.array([-1, 0, 1], dtype=np.int64)
        w_even = np.array([0.25, 0.75, 0.0])
        w_odd = np.array([0.0, 0.75, 0.25])
    elif mode == "bicubic":
        offsets = np.array([-2, -1, 0, 1, 2], dtype=np.int64)
        # even phase: coord = i - 0.25 -> distances to i-2..i+2
        w_even = _cubic_weights(np.array([-1.75, -0.75, 0.25, 1.25, 2.25]))
        # odd phase: coord = i + 0.25
        w_odd = _cubic_weights(np.array([-2.25, -1.25, -0.25, 0.75, 1.75]))
    else:
        raise ValueError(f'Invalid upsampling mode "{mode}".')

    base = np.arange(n)
    gathered = x[..., np.clip(base[None, :] + offsets[:, None], 0, n - 1)]
    even = np.tensordot(w_even, gathered, axes=(0, x.ndim - 1))
    odd = np.tensordot(w_odd, gathered, axes=(0, x.ndim - 1))
    out = np.stack([even, odd], axis=-1).reshape(*x.shape[:-1], 2 * n)
    return np.moveaxis(out, -1, axis).astype(x.dtype)


def yuv_420_to_444(yuv, mode: str = "bilinear", return_tuple: bool = False):
    """420 (y, u, v) planes -> 444 (reference ``functional.py:101-137``)."""
    if len(yuv) != 3:
        raise ValueError("Expected a tuple of 3 planes")
    if mode not in ("bilinear", "bicubic", "nearest"):
        raise ValueError(f'Invalid upsampling mode "{mode}".')

    y, u, v = (np.asarray(c) for c in yuv)
    u = _upsample2_axis(_upsample2_axis(u, -2, mode), -1, mode)
    v = _upsample2_axis(_upsample2_axis(v, -2, mode), -1, mode)
    if return_tuple:
        return y, u, v
    return np.stack((y, u, v), axis=-1)
