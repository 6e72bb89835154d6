"""API-parity shim: the reference exposes the rANS coder as
``compressai.ans`` with ``RansEncoder`` / ``RansDecoder`` /
``BufferedRansEncoder`` (``rans_interface.cpp:361-381``). The same surface
here forwards to the coder facade (C++ host coder when available, Python
spec otherwise).
"""

from .entropy.coder import BufferedEncoder, Decoder, Encoder, StreamDecoder

__all__ = ["RansEncoder", "RansDecoder", "BufferedRansEncoder"]


class RansEncoder(Encoder):
    pass


class BufferedRansEncoder(BufferedEncoder):
    pass


class RansDecoder(Decoder):
    """One-shot + streaming decoder (reference exposes both on one class)."""

    def __init__(self):
        super().__init__()
        self._stream = None

    def set_stream(self, string: bytes):
        self._stream = StreamDecoder(string)

    def decode_stream(self, indexes, cdfs, cdfs_sizes, offsets):
        if self._stream is None:
            raise RuntimeError("set_stream() must be called first")
        return self._stream.decode_stream(indexes, cdfs, cdfs_sizes, offsets)
