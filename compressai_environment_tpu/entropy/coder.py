"""Entropy-coder front-end.

Uniform numpy-array API over the two host coder backends:

* ``"ans"`` (default): the C++ flat-table coder (``csrc/rans.cpp``) when the
  toolchain is available, else the pure-Python spec coder (``rans.py``). Both
  produce identical bytes; the bitstream format is defined in ``rans.py``.
* registry hooks mirror the reference's global coder registry
  (``compressai/__init__.py:37-77``) so ``set_entropy_coder``/
  ``get_entropy_coder``/``available_entropy_coders`` keep working.

Unlike the reference (which round-trips every tensor through Python lists per
batch element — ``entropy_models.py:258-267``), all entry points here take
contiguous numpy arrays and the batched calls fan out across CPU cores in C++.
"""

from __future__ import annotations

import numpy as np

from . import rans as _pyrans
from ._native import load_native

__all__ = [
    "Encoder",
    "Decoder",
    "StreamDecoder",
    "BufferedEncoder",
    "encode_with_indexes",
    "decode_with_indexes",
    "encode_batch",
    "decode_batch",
]


def _as_i32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x).reshape(-1), dtype=np.int32)


def _as_cdf_matrix(cdfs) -> np.ndarray:
    cdfs = np.asarray(cdfs, dtype=np.int32)
    if cdfs.ndim != 2:
        raise ValueError("cdfs must be a 2-D (ncdfs, max_len) int32 matrix")
    return np.ascontiguousarray(cdfs)


def _encode_cap(n: int) -> int:
    # Worst case ~16 bits/symbol for coded symbols plus bypass nibbles;
    # generous bound keeps the right-aligned buffer single-shot.
    return max(4096, 8 * int(n) + 64)


def encode_with_indexes(symbols, indexes, cdfs, cdfs_sizes, offsets,
                        backend: str = "rans") -> bytes:
    """Encode one stream. Arrays may be any shape; flattened in C order.

    ``backend``: "rans" (reference-bit-exact rANS) or "range" (the optional
    Subbotin range-coder stream format, ``range_coder_impl.py``)."""
    symbols = _as_i32(symbols)
    indexes = _as_i32(indexes)
    cdfs = _as_cdf_matrix(cdfs)
    cdfs_sizes = _as_i32(cdfs_sizes)
    offsets = _as_i32(offsets)
    n = symbols.size

    if backend == "range":
        from .range_coder_impl import RangeEncoder

        enc = RangeEncoder()
        enc.encode_with_indexes(symbols, indexes, cdfs, cdfs_sizes, offsets)
        return enc.flush()

    lib = load_native()
    if lib is not None:
        cap = _encode_cap(n)
        buf = np.empty(cap, dtype=np.uint8)
        off = lib.rans_encode(
            symbols, indexes, n, cdfs, cdfs.shape[1], cdfs_sizes, offsets, buf, cap
        )
        if off == -3:
            raise ValueError("invalid CDF tables (validated coder build)")
        if off < 0:  # pragma: no cover - cap bound is generous
            raise RuntimeError("rANS encode buffer overflow")
        return buf[off:].tobytes()

    return _pyrans.RansEncoder().encode_with_indexes(
        symbols, indexes, cdfs, cdfs_sizes, offsets
    )


def decode_with_indexes(string: bytes, indexes, cdfs, cdfs_sizes, offsets,
                        backend: str = "rans") -> np.ndarray:
    indexes = _as_i32(indexes)
    cdfs = _as_cdf_matrix(cdfs)
    cdfs_sizes = _as_i32(cdfs_sizes)
    offsets = _as_i32(offsets)
    n = indexes.size

    if backend == "range":
        from .range_coder_impl import RangeDecoder

        return RangeDecoder(string).decode_stream(
            indexes, cdfs, cdfs_sizes, offsets
        )

    lib = load_native()
    if lib is not None:
        stream = np.frombuffer(string, dtype=np.uint8)
        out = np.empty(n, dtype=np.int32)
        rc = lib.rans_decode(
            np.ascontiguousarray(stream), indexes, n, cdfs, cdfs.shape[1],
            cdfs_sizes, offsets, out,
        )
        if rc == -3:
            raise ValueError("invalid CDF tables (validated coder build)")
        return out

    return _pyrans.RansDecoder().decode_with_indexes(
        string, indexes, cdfs, cdfs_sizes, offsets
    )


def encode_batch(symbols, indexes, cdfs, cdfs_sizes, offsets,
                 backend: str = "rans") -> list:
    """Encode ``batch`` independent streams. symbols/indexes: (batch, n).

    Returns a list of ``bytes``. Uses all CPU cores via OpenMP when the
    native coder is available.
    """
    symbols = np.ascontiguousarray(np.asarray(symbols), dtype=np.int32)
    indexes = np.ascontiguousarray(np.asarray(indexes), dtype=np.int32)
    if symbols.ndim != 2 or symbols.shape != indexes.shape:
        raise ValueError("symbols/indexes must both be (batch, n)")
    cdfs = _as_cdf_matrix(cdfs)
    cdfs_sizes = _as_i32(cdfs_sizes)
    offsets = _as_i32(offsets)
    batch, n = symbols.shape

    if backend == "range":
        return [
            encode_with_indexes(symbols[b], indexes[b], cdfs, cdfs_sizes,
                                offsets, backend="range")
            for b in range(batch)
        ]

    lib = load_native()
    if lib is not None and batch > 0:
        cap = _encode_cap(n)
        buf = np.empty((batch, cap), dtype=np.uint8)
        starts = np.empty(batch, dtype=np.int64)
        rv = lib.rans_encode_batch(
            symbols, indexes, batch, n, cdfs, cdfs.shape[1], cdfs_sizes,
            offsets, buf.reshape(-1), cap, starts,
        )
        if rv == -3:
            raise ValueError("invalid CDF tables (validated coder build)")
        if rv != 0:  # pragma: no cover
            raise RuntimeError("rANS encode buffer overflow")
        return [buf[b, starts[b]:].tobytes() for b in range(batch)]

    return [
        encode_with_indexes(symbols[b], indexes[b], cdfs, cdfs_sizes, offsets)
        for b in range(batch)
    ]


def decode_batch(strings, indexes, cdfs, cdfs_sizes, offsets,
                 backend: str = "rans") -> np.ndarray:
    """Decode ``len(strings)`` independent streams; indexes: (batch, n)."""
    indexes = np.ascontiguousarray(np.asarray(indexes), dtype=np.int32)
    if indexes.ndim != 2 or len(strings) != indexes.shape[0]:
        raise ValueError("indexes must be (batch, n) matching strings")
    cdfs = _as_cdf_matrix(cdfs)
    cdfs_sizes = _as_i32(cdfs_sizes)
    offsets = _as_i32(offsets)
    batch, n = indexes.shape

    if backend == "range":
        return np.stack([
            decode_with_indexes(s, indexes[b], cdfs, cdfs_sizes, offsets,
                                backend="range")
            for b, s in enumerate(strings)
        ]) if batch else np.empty((0, n), dtype=np.int32)

    lib = load_native()
    if lib is not None and batch > 0:
        offsets_b = np.zeros(batch, dtype=np.int64)
        total = 0
        for b, s in enumerate(strings):
            offsets_b[b] = total
            total += len(s)
        blob = np.empty(total, dtype=np.uint8)
        for b, s in enumerate(strings):
            blob[offsets_b[b]: offsets_b[b] + len(s)] = np.frombuffer(s, np.uint8)
        out = np.empty((batch, n), dtype=np.int32)
        lib.rans_decode_batch(
            blob, offsets_b, indexes, batch, n, cdfs, cdfs.shape[1],
            cdfs_sizes, offsets, out.reshape(-1),
        )
        return out

    return np.stack(
        [
            decode_with_indexes(s, indexes[b], cdfs, cdfs_sizes, offsets)
            for b, s in enumerate(strings)
        ]
    ) if batch else np.empty((0, n), dtype=np.int32)


class Encoder:
    """One-shot encoder object (reference ``RansEncoder`` surface)."""

    def encode_with_indexes(self, symbols, indexes, cdfs, cdfs_sizes, offsets):
        return encode_with_indexes(symbols, indexes, cdfs, cdfs_sizes, offsets)


class Decoder:
    """One-shot decoder object (reference ``RansDecoder`` surface)."""

    def decode_with_indexes(self, string, indexes, cdfs, cdfs_sizes, offsets):
        return decode_with_indexes(string, indexes, cdfs, cdfs_sizes, offsets)


class BufferedEncoder:
    """Incremental encoder for autoregressive models: buffer symbols across
    many put() calls, emit one stream at flush() (reference
    ``BufferedRansEncoder`` semantics)."""

    def __init__(self):
        self._lib = load_native()
        if self._lib is not None:
            self._handle = self._lib.rans_enc_new()
        else:
            self._py = _pyrans.BufferedRansEncoder()
        self._n = 0

    def encode_with_indexes(self, symbols, indexes, cdfs, cdfs_sizes, offsets):
        symbols = _as_i32(symbols)
        indexes = _as_i32(indexes)
        cdfs = _as_cdf_matrix(cdfs)
        cdfs_sizes = _as_i32(cdfs_sizes)
        offsets = _as_i32(offsets)
        self._n += symbols.size
        if self._lib is not None:
            self._lib.rans_enc_put(
                self._handle, symbols, indexes, symbols.size, cdfs,
                cdfs.shape[1], cdfs_sizes, offsets,
            )
        else:
            self._py.encode_with_indexes(symbols, indexes, cdfs, cdfs_sizes, offsets)

    def flush(self) -> bytes:
        if self._lib is not None:
            cap = _encode_cap(self._n)
            buf = np.empty(cap, dtype=np.uint8)
            off = self._lib.rans_enc_flush(self._handle, buf, cap)
            if off < 0:  # pragma: no cover
                raise RuntimeError("rANS encode buffer overflow")
            self._n = 0
            return buf[off:].tobytes()
        self._n = 0
        return self._py.flush()

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_handle", None):
            self._lib.rans_enc_free(self._handle)
            self._handle = None


class StreamDecoder:
    """Incremental decoder with persistent state (reference
    ``RansDecoder.set_stream``/``decode_stream`` semantics).

    ``backend="range"`` reads the Subbotin range-coder stream format
    instead (``range_coder_impl.py``); same incremental surface."""

    def __init__(self, string: bytes | None = None, backend: str = "rans"):
        if backend == "range":
            from .range_coder_impl import RangeDecoder

            self._lib = None
            self._handle = None
            self._py = RangeDecoder()
            if string is not None:
                self.set_stream(string)
            return
        self._lib = load_native()
        self._handle = None
        if self._lib is None:
            self._py = _pyrans.RansDecoder()
        if string is not None:
            self.set_stream(string)

    def set_stream(self, string: bytes):
        if self._lib is not None:
            if self._handle:
                self._lib.rans_dec_free(self._handle)
            stream = np.ascontiguousarray(np.frombuffer(string, dtype=np.uint8))
            self._handle = self._lib.rans_dec_new(stream, stream.size)
        else:
            self._py.set_stream(string)

    def decode_stream(self, indexes, cdfs, cdfs_sizes, offsets) -> np.ndarray:
        indexes = _as_i32(indexes)
        cdfs = _as_cdf_matrix(cdfs)
        cdfs_sizes = _as_i32(cdfs_sizes)
        offsets = _as_i32(offsets)
        if self._lib is not None:
            out = np.empty(indexes.size, dtype=np.int32)
            self._lib.rans_dec_decode(
                self._handle, indexes, indexes.size, cdfs, cdfs.shape[1],
                cdfs_sizes, offsets, out,
            )
            return out
        return self._py.decode_stream(indexes, cdfs, cdfs_sizes, offsets)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_handle", None):
            self._lib.rans_dec_free(self._handle)
            self._handle = None
