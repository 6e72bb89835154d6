"""Quantized-CDF construction for range-ANS coding.

Converts a floating-point PMF (plus a tail-mass bucket) into an integer CDF
whose total mass is exactly ``1 << precision``, with every symbol given a
non-zero frequency.  The algorithm reproduces, bit for bit, the semantics of
the reference CompressAI C++ extension (``compressai/cpp_exts/ops/ops.cpp:40-109``):

1. round each ``pmf[i] * 2**precision`` half-away-from-zero (C ``std::round``
   on ``float``), accumulating in float32 like the reference does,
2. rescale by integer arithmetic ``(2**precision * p) // total``,
3. prefix-sum and pin ``cdf[-1] = 2**precision``,
4. repair zero-frequency bins by stealing one count at a time from the
   currently lowest-frequency symbol with ``freq > 1`` (sequential scan).

Golden value (reference ``tests/test_ops.py:104-106``)::

    pmf_to_quantized_cdf([0.1, 0.2, 0, 0], 16) == [0, 21845, 65534, 65535, 65536]

Bit-exactness of every bitstream produced by the framework depends on this
function, so it is deliberately plain numpy/int code, not jitted.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pmf_to_quantized_cdf", "pmf_to_quantized_cdf_batch"]


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> np.ndarray:
    """Quantize a PMF to an integer CDF summing to ``1 << precision``.

    Args:
        pmf: 1-D array-like of non-negative, finite floats. The final entry
            customarily holds the tail mass.
        precision: number of probability bits (16 for the rANS coder).

    Returns:
        int32 array of length ``len(pmf) + 1`` with ``cdf[0] == 0``,
        ``cdf[-1] == 1 << precision`` and strictly increasing entries.
    """
    pmf = np.asarray(pmf, dtype=np.float32)
    if pmf.ndim != 1:
        raise ValueError("pmf must be 1-D")
    if np.any(~np.isfinite(pmf)) or np.any(pmf < 0):
        raise ValueError(
            "Invalid `pmf`, non-finite or negative element found: "
            f"{pmf[~np.isfinite(pmf) | (pmf < 0)][:1]}"
        )

    one = 1 << precision
    # float32 multiply then round-half-away-from-zero, matching C++
    # std::round(p * (1 << precision)) on float operands.
    scaled = (pmf * np.float32(one)).astype(np.float64)
    freqs = np.floor(scaled + 0.5).astype(np.int64)

    total = int(freqs.sum())
    if total == 0:
        raise ValueError(
            "Invalid `pmf`: at least one element must have a non-zero probability."
        )

    # Integer rescale: (2**precision * f) // total, then prefix sum.
    freqs = (one * freqs) // total
    cdf = np.zeros(len(pmf) + 1, dtype=np.int64)
    np.cumsum(freqs, out=cdf[1:])
    cdf[-1] = one

    # Repair zero-frequency bins. The reference scans positions left to right,
    # re-evaluating frequencies after each fix, so this loop is stateful.
    n = len(cdf)
    for i in range(n - 1):
        if cdf[i] == cdf[i + 1]:
            freq = np.diff(cdf)
            candidates = np.where(freq > 1)[0]
            if len(candidates) == 0:  # pragma: no cover - pathological pmf
                raise ValueError("Cannot repair CDF: no symbol has freq > 1")
            best_steal = candidates[np.argmin(freq[candidates])]
            if best_steal < i:
                cdf[best_steal + 1 : i + 1] -= 1
            else:
                cdf[i + 1 : best_steal + 1] += 1

    assert cdf[0] == 0
    assert cdf[-1] == one
    assert np.all(np.diff(cdf) > 0), "CDF entries must be strictly increasing"
    return cdf.astype(np.int32)


def pmf_to_quantized_cdf_batch(
    pmfs: np.ndarray,
    tail_mass: np.ndarray,
    pmf_lengths: np.ndarray,
    max_length: int,
    precision: int = 16,
) -> np.ndarray:
    """Build a padded ``(n, max_length + 2)`` int32 CDF table.

    Row ``i`` contains ``pmf_to_quantized_cdf(concat(pmfs[i, :pmf_lengths[i]],
    tail_mass[i]))`` followed by zero padding — the same layout the reference
    ``EntropyModel._pmf_to_cdf`` produces (``entropy_models.py:204-212``).
    """
    pmfs = np.asarray(pmfs, dtype=np.float32)
    tail_mass = np.asarray(tail_mass, dtype=np.float32).reshape(-1)
    pmf_lengths = np.asarray(pmf_lengths, dtype=np.int64).reshape(-1)
    n = len(pmf_lengths)
    out = np.zeros((n, max_length + 2), dtype=np.int32)
    for i in range(n):
        plen = int(pmf_lengths[i])
        prob = np.concatenate([pmfs[i, :plen], tail_mass[i : i + 1]])
        row = pmf_to_quantized_cdf(prob, precision)
        out[i, : len(row)] = row
    return out
