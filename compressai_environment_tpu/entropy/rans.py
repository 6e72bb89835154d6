"""Pure-Python range-ANS (rANS) codec — the executable bitstream specification.

This module defines the *normative* behavior of the framework's entropy coder.
It reproduces, bit for bit, the stream format of the reference CompressAI rANS
coder (``compressai/cpp_exts/rans/rans_interface.cpp`` +
``third_party/ryg_rans/rans64.h``), which is itself the public-domain ryg
64-bit rANS:

* 64-bit coder state, normalization interval lower bound ``L = 1 << 31``,
* renormalization emits 32-bit little-endian words,
* probability precision = 16 bits,
* symbols are encoded in **reverse** order and the stream is written
  **backwards**; the final flush prepends the 64-bit state as two 32-bit
  words (low word first),
* out-of-range symbols fold onto the per-CDF escape symbol
  (``max_value = cdf_length - 2``) and the residual is coded in 4-bit
  bypass nibbles: first a unary-ish nibble count (15 means "add next
  nibble"), then the nibbles of ``raw_val`` from least significant up, where
  ``raw_val = -2v - 1`` for negative ``v`` and ``2 (v - max_value)``
  otherwise.

The fast production paths (the C++ host coder in ``csrc/rans.cpp`` and the
Pallas on-chip lanes) are validated against this model byte-for-byte.

This implementation is intentionally simple Python-with-ints (exact 64-bit
semantics, no numpy overflow pitfalls); use :mod:`..entropy.coder` for the
dispatching front-end.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "PRECISION",
    "BYPASS_PRECISION",
    "MAX_BYPASS_VAL",
    "RANS64_L",
    "BufferedRansEncoder",
    "RansEncoder",
    "RansDecoder",
]

PRECISION = 16
BYPASS_PRECISION = 4
MAX_BYPASS_VAL = (1 << BYPASS_PRECISION) - 1
RANS64_L = 1 << 31

_MASK32 = (1 << 32) - 1


def _sym_records(symbols, indexes, cdfs, cdfs_sizes, offsets):
    """Map (symbol, cdf index) pairs to (start, freq_or_nbits, bypass) records.

    Forward pass of the encoder: escape folding and bypass expansion. For
    bypass records ``start`` holds the raw value and ``freq`` the bit count.
    """
    syms = []
    for value, cdf_idx in zip(symbols, indexes):
        cdf = cdfs[cdf_idx]
        max_value = int(cdfs_sizes[cdf_idx]) - 2
        value = int(value) - int(offsets[cdf_idx])

        raw_val = 0
        if value < 0:
            raw_val = -2 * value - 1
            value = max_value
        elif value >= max_value:
            raw_val = 2 * (value - max_value)
            value = max_value

        start = int(cdf[value])
        freq = int(cdf[value + 1]) - start
        syms.append((start, freq, False))

        if value == max_value:
            n_bypass = 0
            while (raw_val >> (n_bypass * BYPASS_PRECISION)) != 0:
                n_bypass += 1
            val = n_bypass
            while val >= MAX_BYPASS_VAL:
                syms.append((MAX_BYPASS_VAL, MAX_BYPASS_VAL + 1, True))
                val -= MAX_BYPASS_VAL
            syms.append((val, val + 1, True))
            for j in range(n_bypass):
                nib = (raw_val >> (j * BYPASS_PRECISION)) & MAX_BYPASS_VAL
                syms.append((nib, nib + 1, True))
    return syms


class BufferedRansEncoder:
    """Buffers symbol records, then flushes them in reverse into a bitstream."""

    def __init__(self):
        self._syms = []

    def encode_with_indexes(self, symbols, indexes, cdfs, cdfs_sizes, offsets):
        self._syms.extend(_sym_records(symbols, indexes, cdfs, cdfs_sizes, offsets))

    def flush(self) -> bytes:
        state = RANS64_L
        emitted = []  # 32-bit words in emission order (stream tail first)

        for start, freq, bypass in reversed(self._syms):
            if not bypass:
                # Rans64EncPut
                x_max = ((RANS64_L >> PRECISION) << 32) * freq
                if state >= x_max:
                    emitted.append(state & _MASK32)
                    state >>= 32
                state = ((state // freq) << PRECISION) + (state % freq) + start
            else:
                # Rans64EncPutBits: `start` = raw value, nbits = BYPASS_PRECISION
                val = start
                freq_b = 1 << (PRECISION - BYPASS_PRECISION)
                x_max = ((RANS64_L >> PRECISION) << 32) * freq_b
                if state >= x_max:
                    emitted.append(state & _MASK32)
                    state >>= 32
                state = (state << BYPASS_PRECISION) | val

        self._syms = []
        # Forward stream = [state_low, state_high] + emitted words in reverse
        # emission order (the encoder writes backwards).
        words = [state & _MASK32, (state >> 32) & _MASK32] + emitted[::-1]
        return np.asarray(words, dtype="<u4").tobytes()


class RansEncoder:
    def encode_with_indexes(self, symbols, indexes, cdfs, cdfs_sizes, offsets):
        enc = BufferedRansEncoder()
        enc.encode_with_indexes(symbols, indexes, cdfs, cdfs_sizes, offsets)
        return enc.flush()


class RansDecoder:
    """Forward-reading decoder, including persistent-stream incremental mode
    (used per-pixel by the autoregressive models)."""

    def __init__(self):
        self._words = None
        self._pos = 0
        self._state = 0

    # -- one-shot API ------------------------------------------------------
    def decode_with_indexes(self, encoded, indexes, cdfs, cdfs_sizes, offsets):
        self.set_stream(encoded)
        return self.decode_stream(indexes, cdfs, cdfs_sizes, offsets)

    # -- streaming API -----------------------------------------------------
    def set_stream(self, encoded: bytes):
        buf = np.frombuffer(encoded, dtype="<u4")
        self._words = buf
        self._state = int(buf[0]) | (int(buf[1]) << 32)
        self._pos = 2

    def _renorm(self):
        if self._state < RANS64_L:
            self._state = (self._state << 32) | int(self._words[self._pos])
            self._pos += 1

    def _get_bits(self, nbits):
        val = self._state & ((1 << nbits) - 1)
        self._state >>= nbits
        self._renorm()
        return val

    def decode_stream(self, indexes, cdfs, cdfs_sizes, offsets):
        out = np.empty(len(indexes), dtype=np.int32)
        mask = (1 << PRECISION) - 1
        for i, cdf_idx in enumerate(indexes):
            cdf_idx = int(cdf_idx)
            cdf = np.asarray(cdfs[cdf_idx])
            size = int(cdfs_sizes[cdf_idx])
            max_value = size - 2
            offset = int(offsets[cdf_idx])

            cum_freq = self._state & mask
            # smallest s with cdf[s+1] > cum_freq
            s = int(np.searchsorted(cdf[:size], cum_freq, side="right")) - 1
            start = int(cdf[s])
            freq = int(cdf[s + 1]) - start

            # Rans64DecAdvance
            self._state = freq * (self._state >> PRECISION) + cum_freq - start
            self._renorm()

            value = s
            if value == max_value:
                val = self._get_bits(BYPASS_PRECISION)
                n_bypass = val
                while val == MAX_BYPASS_VAL:
                    val = self._get_bits(BYPASS_PRECISION)
                    n_bypass += val
                raw_val = 0
                for j in range(n_bypass):
                    raw_val |= self._get_bits(BYPASS_PRECISION) << (
                        j * BYPASS_PRECISION
                    )
                value = raw_val >> 1
                if raw_val & 1:
                    value = -value - 1
                else:
                    value += max_value

            out[i] = value + offset
        return out
