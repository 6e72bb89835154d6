"""tpu-format rate-overhead gates for the video and hyperprior fixtures
(round-4 VERDICT item 4: the flagship gate alone let the GOP fixtures pay
+12% and hyperprior +0.023 bpp).

Round-5 format work being pinned here: varint blob header v3 (~8-10 B vs
17 B), ~2048-symbols/lane floor for small (< 128 Ki) tensors, and the
bit-packed escape side channel (u32 -> w-bit packed; escapes dominated the
GOP overhead on the motion/residual branches). Measured at these fixtures
the video tpu format is now SMALLER than the reference-exact rans format
(-1.6%) and hyperprior pays ~+0.010 bpp (the Kodak-scale y tensor keeps
256 lanes for decode speed).
"""

import os
from pathlib import Path

import numpy as np
import pytest

CKPT = Path(__file__).parent.parent / "checkpoints"


def _stream_bytes(obj) -> int:
    if isinstance(obj, dict):
        return sum(_stream_bytes(v) for v in obj.values())
    if isinstance(obj, (list, tuple)):
        return sum(_stream_bytes(v) for v in obj)
    return len(obj)


@pytest.mark.skipif(
    not (CKPT / "ssf2020-synth-q3.msgpack").exists(),
    reason="trained ssf checkpoint not present",
)
def test_video_tpu_format_rate_overhead_bounded():
    """GOP coding in the tpu format must cost at most +2% over rans."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from train_synth_video import synth_triplet_batch

    from compressai_environment_tpu.models.video import ScaleSpaceFlow
    from compressai_environment_tpu.utils.checkpoint import restore_into

    ssf = ScaleSpaceFlow()
    restore_into(ssf, str(CKPT / "ssf2020-synth-q3.msgpack"))
    gop = synth_triplet_batch(999, 2, 128, 128)
    frames = [np.asarray(gop[:, t]) for t in range(3)]
    size = {}
    for fmt in ("rans", "tpu"):
        ssf.stream_format = fmt
        c = ssf.compress(frames)
        size[fmt] = _stream_bytes(c[0])
        # streams must decode (catches format drift the size check misses)
        dec = ssf.decompress(c[0], c[1])
        assert len(dec) == 3
    assert size["tpu"] <= size["rans"] * 1.02, (
        f"video tpu-format overhead regressed: {size['tpu']} vs "
        f"rans {size['rans']} (+{100 * (size['tpu'] / size['rans'] - 1):.2f}%)"
    )


@pytest.mark.skipif(
    not (CKPT / "bmshj2018-hyperprior-synth-q5.msgpack").exists(),
    reason="trained hyperprior checkpoint not present",
)
def test_hyperprior_tpu_format_rate_overhead_bounded():
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from train_synth import synth_batch

    from compressai_environment_tpu.models import ScaleHyperprior
    from compressai_environment_tpu.utils.checkpoint import restore_into

    hp = ScaleHyperprior(128, 192)
    restore_into(hp, str(CKPT / "bmshj2018-hyperprior-synth-q5.msgpack"))
    x = synth_batch(555, 2, 256, 256)
    bpp = {}
    for fmt in ("rans", "tpu"):
        hp.stream_format = fmt
        c = hp.compress(x)
        bpp[fmt] = _stream_bytes(c["strings"]) * 8 / (2 * 256 * 256)
        dec = hp.decompress(c["strings"], c["shape"])
        assert np.asarray(dec["x_hat"]).shape == x.shape
    assert bpp["tpu"] <= bpp["rans"] + 0.015, (
        f"hyperprior tpu-format overhead regressed: {bpp['tpu']:.4f} vs "
        f"rans {bpp['rans']:.4f}"
    )
