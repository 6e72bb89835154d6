"""Vimeo90K-style triplet video folder dataset
(reference ``datasets/video.py:42-132``), torch-free.

Returns a tuple of three consecutive float32 (H, W, 3) frames; supports
random frame intervals and random temporal flips for training.
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np

from .image import load_image

__all__ = ["VideoFolder"]


class VideoFolder:
    """``rootdir/{split}.list`` + ``rootdir/sequences/<folder>/*.png`` layout.

    Args:
        root: dataset root.
        rnd_interval: sample frames with a random stride.
        rnd_temp_order: randomly reverse temporal order.
        transform: optional callable applied to the stacked (H, W, 9) array
            before it is split back into 3 frames.
        split: "train" or "test".
    """

    def __init__(
        self,
        root,
        rnd_interval: bool = False,
        rnd_temp_order: bool = False,
        transform=None,
        split: str = "train",
    ):
        splitfile = Path(root) / f"{split}.list"
        splitdir = Path(root) / "sequences"
        if not splitfile.is_file():
            raise RuntimeError(f'Invalid file "{root}"')
        if not splitdir.is_dir():
            raise RuntimeError(f'Invalid directory "{root}"')

        with open(splitfile) as f_in:
            self.sample_folders = [splitdir / line.strip() for line in f_in if line.strip()]

        self.max_frames = 3
        self.rnd_interval = rnd_interval
        self.rnd_temp_order = rnd_temp_order
        self.transform = transform

    def __getitem__(self, index):
        folder = self.sample_folders[index]
        samples = sorted(f for f in folder.iterdir() if f.is_file())

        max_interval = (len(samples) + 2) // self.max_frames
        interval = random.randint(1, max_interval) if self.rnd_interval else 1
        frame_paths = (samples[::interval])[: self.max_frames]

        frames = np.concatenate([load_image(p) for p in frame_paths], axis=-1)
        if self.transform:
            frames = self.transform(frames)
        frames = tuple(
            frames[..., 3 * i : 3 * (i + 1)] for i in range(self.max_frames)
        )

        if self.rnd_temp_order and random.random() < 0.5:
            return frames[::-1]
        return frames

    def __len__(self) -> int:
        return len(self.sample_folders)
