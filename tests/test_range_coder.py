"""The optional "rangecoder" backend (entropy/range_coder_impl.py).

The reference auto-registers a ``rangecoder`` coder name when the
``range_coder`` pip package imports (``compressai/__init__.py:40-45``); its
proxy then calls ``encode_with_indexes`` on that package's encoder — a
method the package does not define (``entropy_models.py:67-87``) — so no
reference rangecoder bitstream exists to match. Here the name maps to a
real Subbotin range coder sharing the rANS symbol protocol (same CDF
tables, escape fold, bypass nibbles); these tests pin registry surface,
stream self-consistency, and model-level round trips.
"""

import numpy as np
import pytest

import compressai_environment_tpu as ct
from compressai_environment_tpu.entropy import coder
from compressai_environment_tpu.entropy.range_coder_impl import (
    RangeDecoder,
    RangeEncoder,
)


def _toy_tables(rng, n_cdfs=4, support=9, precision=16):
    from compressai_environment_tpu.entropy.cdf import pmf_to_quantized_cdf

    cdfs = np.zeros((n_cdfs, support + 2), np.int32)
    sizes = np.zeros(n_cdfs, np.int32)
    offsets = np.full(n_cdfs, -(support // 2), np.int32)
    for i in range(n_cdfs):
        pmf = rng.random(support).astype(np.float64) + 0.01
        pmf /= pmf.sum() * 1.02  # leave tail mass for the escape symbol
        q = pmf_to_quantized_cdf(list(pmf) + [1 - pmf.sum()], precision)
        cdfs[i, : len(q)] = q
        sizes[i] = len(q)
    return cdfs, sizes, offsets


def test_registry_lists_rangecoder():
    assert "rangecoder" in ct.available_entropy_coders()
    assert ct.coder_stream_formats["rangecoder"] == "range"
    prev = ct.get_entropy_coder()
    try:
        ct.set_entropy_coder("rangecoder")
        assert ct.get_entropy_coder() == "rangecoder"
    finally:
        ct.set_entropy_coder(prev)


def test_roundtrip_with_escapes(rng):
    cdfs, sizes, offsets = _toy_tables(rng)
    n = 500
    indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int32)
    # mix of in-range symbols and far out-of-range escapes (bypass path)
    symbols = rng.integers(-4, 5, n).astype(np.int32)
    symbols[::37] = 900
    symbols[::41] = -1234
    enc = RangeEncoder()
    enc.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    stream = enc.flush()
    out = RangeDecoder(stream).decode_stream(indexes, cdfs, sizes, offsets)
    np.testing.assert_array_equal(out, symbols)


def test_stream_differs_from_rans(rng):
    cdfs, sizes, offsets = _toy_tables(rng)
    n = 64
    indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int32)
    symbols = rng.integers(-4, 5, n).astype(np.int32)
    s_range = coder.encode_with_indexes(
        symbols, indexes, cdfs, sizes, offsets, backend="range"
    )
    s_rans = coder.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    assert s_range != s_rans  # genuinely a different stream format
    out = coder.decode_with_indexes(
        s_range, indexes, cdfs, sizes, offsets, backend="range"
    )
    np.testing.assert_array_equal(out, symbols)


def test_coder_front_end_batch(rng):
    cdfs, sizes, offsets = _toy_tables(rng)
    shape = (3, 200)
    indexes = rng.integers(0, cdfs.shape[0], shape).astype(np.int32)
    symbols = rng.integers(-4, 5, shape).astype(np.int32)
    strings = coder.encode_batch(
        symbols, indexes, cdfs, sizes, offsets, backend="range"
    )
    assert len(strings) == 3 and all(isinstance(s, bytes) for s in strings)
    out = coder.decode_batch(strings, indexes, cdfs, sizes, offsets,
                             backend="range")
    np.testing.assert_array_equal(out, symbols)


def test_incremental_stream_decoder(rng):
    """StreamDecoder(backend="range"): chunked decode equals one-shot."""
    cdfs, sizes, offsets = _toy_tables(rng)
    n = 120
    indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int32)
    symbols = rng.integers(-4, 5, n).astype(np.int32)
    stream = coder.encode_with_indexes(
        symbols, indexes, cdfs, sizes, offsets, backend="range"
    )
    dec = coder.StreamDecoder(stream, backend="range")
    outs = [
        dec.decode_stream(indexes[i : i + 40], cdfs, sizes, offsets)
        for i in range(0, n, 40)
    ]
    np.testing.assert_array_equal(np.concatenate(outs), symbols)


@pytest.mark.slow
def test_factorized_model_roundtrip_range_format(rng):
    """Model-level compress/decompress with stream_format="range"."""
    import jax

    from compressai_environment_tpu.models import FactorizedPrior

    model = FactorizedPrior(32, 48).init(
        key=jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    model.update(force=True)
    model.stream_format = "range"
    x = rng.random((2, 64, 64, 3), np.float32)
    out = model.compress(x)
    dec = model.decompress(out["strings"], out["shape"])
    assert np.asarray(dec["x_hat"]).shape == (2, 64, 64, 3)
    # the range streams must really round-trip the quantized latents:
    # re-encoding the decoded latents is only possible if symbols matched,
    # so compare against the rans-format symbols directly
    model.stream_format = "rans"
    out2 = model.compress(x)
    from compressai_environment_tpu.entropy_models import bottleneck as eb_ops

    y1 = eb_ops.decompress(
        out["strings"][0], out["shape"], model._medians(), model.tables["y"],
        fmt="range",
    )
    y2 = eb_ops.decompress(
        out2["strings"][0], out2["shape"], model._medians(), model.tables["y"],
        fmt="rans",
    )
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
