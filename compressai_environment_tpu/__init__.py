"""compressai_environment_tpu — a TPU-native learned image/video compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CompressAI
(InterDigital): learned image/video codecs (factorized prior, scale/mean-scale
hyperpriors, joint autoregressive models, Cheng2020, scale-space-flow video),
rANS entropy coding (C++ host coder + on-chip Pallas lanes), a pretrained-zoo
import path from PyTorch checkpoints, evaluation/benchmark CLIs, and
data-parallel scale-out over a TPU device mesh.

Global entropy-coder registry mirrors the reference surface
(``compressai/__init__.py:37-77``).
"""

from __future__ import annotations

__version__ = "0.1.0"

_entropy_coder = "ans"
# "ans": reference-bit-exact host rANS (stream_format "rans");
# "tpu": on-chip interleaved-lane rANS (stream_format "tpu");
# "rangecoder": host Subbotin range coder (stream_format "range") — the
#   reference registers this name when the ``range_coder`` pip package
#   imports (compressai/__init__.py:40-45), but its proxy then calls
#   ``encode_with_indexes`` on that package's objects, a method they do not
#   define (entropy_models.py:67-87) — so there is no reference rangecoder
#   bitstream to match. Ours is a real, self-consistent range-coder format
#   (entropy/range_coder_impl.py) with no external dependency.
_available_entropy_coders = ["ans", "tpu", "rangecoder"]

#: coder registry name -> CompressionModel.stream_format value
coder_stream_formats = {"ans": "rans", "tpu": "tpu", "rangecoder": "range"}


def set_entropy_coder(entropy_coder: str) -> None:
    """Specify the default entropy coder used to encode the bit-streams."""
    global _entropy_coder
    if entropy_coder not in _available_entropy_coders:
        raise ValueError(
            f'Invalid entropy coder "{entropy_coder}", choose from '
            f'({", ".join(_available_entropy_coders)}).'
        )
    _entropy_coder = entropy_coder


def get_entropy_coder() -> str:
    """Return the name of the default entropy coder used to encode the bit-streams."""
    return _entropy_coder


def available_entropy_coders():
    """Return the list of available entropy coders."""
    return _available_entropy_coders
