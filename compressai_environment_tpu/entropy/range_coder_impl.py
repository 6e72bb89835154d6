"""Carry-less (Subbotin) range coder — the optional "rangecoder" backend.

The reference auto-registers a ``rangecoder`` entry when the ``range_coder``
pip package imports (``compressai/__init__.py:40-45``) and routes it through
the ``_EntropyCoder`` proxy (``entropy_models.py:67-70``). Note that the
proxy calls ``encode_with_indexes`` on the backend object — a method the pip
package's ``RangeEncoder`` does not define — so the reference's rangecoder
path has no working bitstream to be byte-compatible with. This module
therefore implements a REAL range coder with the framework's
``encode_with_indexes``/``decode_with_indexes`` surface: selecting
``"rangecoder"`` produces genuine range-coder streams (FIFO, byte-oriented),
self-consistent between this encoder and decoder and covered by round-trip
tests, but it is a distinct stream format from both "ans" and "tpu".

Coder: Subbotin carry-less range coder, 32-bit state:
    TOP = 1<<24, BOT = 1<<16
    encode(cf, f, tot): range //= tot; low += cf*range; range *= f; renorm
    renorm: while the top byte of ``low`` is settled — either
    ``(low ^ (low+range)) < TOP`` (no carry can change it) or ``range < BOT``
    (force-shrink ``range = -low & (BOT-1)``) — emit ``low>>24``, shift both
    left by 8.
The symbol protocol (CDF tables, escape fold to ``max_value``, 4-bit bypass
nibble expansion) is identical to the rANS spec coder (``rans.py:52-88``),
so the same quantized CDF tables drive both backends. Bypass nibbles are
coded with the uniform 16-ary distribution (tot=16, f=1).

Encoding is FIFO (unlike rANS's reversed flush), so this backend needs no
buffering pass and streams decode in symbol order.
"""

from __future__ import annotations

import numpy as np

from .rans import BYPASS_PRECISION, MAX_BYPASS_VAL, PRECISION, _sym_records

__all__ = ["RangeEncoder", "RangeDecoder"]

_TOP = 1 << 24
_BOT = 1 << 16
_M32 = (1 << 32) - 1


class RangeEncoder:
    """One-shot / incremental range encoder (``encode_with_indexes`` surface)."""

    def __init__(self):
        self._low = 0
        self._range = _M32
        self._out = bytearray()

    def _encode(self, cf: int, f: int, tot_bits: int):
        r = self._range >> tot_bits
        self._low = (self._low + cf * r) & _M32
        self._range = f * r
        while True:
            if (self._low ^ (self._low + self._range)) & _M32 < _TOP:
                pass
            elif self._range < _BOT:
                self._range = (-self._low) & (_BOT - 1)
            else:
                break
            self._out.append((self._low >> 24) & 0xFF)
            self._low = (self._low << 8) & _M32
            self._range = (self._range << 8) & _M32

    def encode_with_indexes(self, symbols, indexes, cdfs, cdfs_sizes, offsets):
        for start, freq, bypass in _sym_records(
            np.asarray(symbols).reshape(-1), np.asarray(indexes).reshape(-1),
            np.asarray(cdfs), np.asarray(cdfs_sizes), np.asarray(offsets)
        ):
            if bypass:
                # `start` = nibble value in [0, 15], uniform tot=16
                self._encode(start, 1, BYPASS_PRECISION)
            else:
                self._encode(start, freq, PRECISION)

    def flush(self) -> bytes:
        for _ in range(4):
            self._out.append((self._low >> 24) & 0xFF)
            self._low = (self._low << 8) & _M32
        out = bytes(self._out)
        self._low, self._range, self._out = 0, _M32, bytearray()
        return out


class RangeDecoder:
    """Forward-reading decoder with persistent-stream incremental mode."""

    def __init__(self, string: bytes | None = None):
        self._buf = b""
        self._pos = 0
        self._low = 0
        self._range = _M32
        self._code = 0
        if string is not None:
            self.set_stream(string)

    def set_stream(self, string: bytes):
        self._buf = string
        self._pos = 0
        self._low = 0
        self._range = _M32
        self._code = 0
        for _ in range(4):
            self._code = ((self._code << 8) | self._next_byte()) & _M32

    def _next_byte(self) -> int:
        b = self._buf[self._pos] if self._pos < len(self._buf) else 0
        self._pos += 1
        return b

    def _dec_freq(self, tot_bits: int) -> int:
        self._range >>= tot_bits
        return ((self._code - self._low) & _M32) // self._range

    def _dec_update(self, cf: int, f: int):
        self._low = (self._low + cf * self._range) & _M32
        self._range = f * self._range
        while True:
            if (self._low ^ (self._low + self._range)) & _M32 < _TOP:
                pass
            elif self._range < _BOT:
                self._range = (-self._low) & (_BOT - 1)
            else:
                break
            self._code = ((self._code << 8) | self._next_byte()) & _M32
            self._low = (self._low << 8) & _M32
            self._range = (self._range << 8) & _M32

    def _get_nibble(self) -> int:
        v = self._dec_freq(BYPASS_PRECISION)
        self._dec_update(v, 1)
        return v

    def decode_stream(self, indexes, cdfs, cdfs_sizes, offsets) -> np.ndarray:
        indexes = np.asarray(indexes).reshape(-1)
        cdfs = np.asarray(cdfs)
        cdfs_sizes = np.asarray(cdfs_sizes)
        offsets = np.asarray(offsets)
        out = np.empty(indexes.size, dtype=np.int32)
        for i, cdf_idx in enumerate(indexes):
            cdf_idx = int(cdf_idx)
            cdf = cdfs[cdf_idx]
            size = int(cdfs_sizes[cdf_idx])
            max_value = size - 2

            cum = min(self._dec_freq(PRECISION), (1 << PRECISION) - 1)
            s = int(np.searchsorted(cdf[:size], cum, side="right")) - 1
            start = int(cdf[s])
            freq = int(cdf[s + 1]) - start
            self._dec_update(start, freq)

            value = s
            if value == max_value:
                val = self._get_nibble()
                n_bypass = val
                while val == MAX_BYPASS_VAL:
                    val = self._get_nibble()
                    n_bypass += val
                raw = 0
                for j in range(n_bypass):
                    raw |= self._get_nibble() << (j * BYPASS_PRECISION)
                value = raw >> 1
                value = -value - 1 if raw & 1 else value + max_value
            out[i] = value + int(offsets[cdf_idx])
        return out

    def decode_with_indexes(self, string, indexes, cdfs, cdfs_sizes, offsets):
        self.set_stream(string)
        return self.decode_stream(indexes, cdfs, cdfs_sizes, offsets)
