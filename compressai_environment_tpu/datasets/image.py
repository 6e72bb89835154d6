"""Image folder dataset (reference ``datasets/image.py:36-81``), torch-free.

Yields float32 channel-last RGB arrays in [0, 1]; an optional ``transform``
callable maps the raw array (e.g. random crop for training).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["ImageFolder", "load_image"]


def load_image(path) -> np.ndarray:
    """Read an image file to float32 (H, W, 3) RGB in [0, 1]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


class ImageFolder:
    """``rootdir/{train,test}/img*.png`` layout.

    Args:
        root: dataset root containing the split directories.
        transform: optional callable applied to the (H, W, 3) float array.
        split: subdirectory name ("train" or "test").
    """

    def __init__(self, root, transform=None, split="train"):
        splitdir = Path(root) / split
        if not splitdir.is_dir():
            raise RuntimeError(f'Invalid directory "{root}"')
        self.samples = sorted(f for f in splitdir.iterdir() if f.is_file())
        self.transform = transform

    def __getitem__(self, index) -> np.ndarray:
        img = load_image(self.samples[index])
        if self.transform:
            return self.transform(img)
        return img

    def __len__(self) -> int:
        return len(self.samples)
