"""Folded wide-row coding (round 4): wide CDF rows (e.g. the 64-row
Gaussian scale table, stride ~3100 — reference rans_interface.cpp:247-252)
are re-expressed as coarse CDFs with bucket frequencies divisible by 2^k;
the coder synthesizes the wide-table (start, freq) in-scan, so the blob is
plain interleaved rANS over ``build_coding_cdf`` with no side channel.

Checks: coarse-table invariants, synthesized-CDF validity, device
encode/decode roundtrips through the one-hot cores (incl. escapes), host
fallback byte-parity, k=0 bit-compatibility, and the rate penalty bound.
"""

import numpy as np
import pytest

from compressai_environment_tpu.entropy import vrans
from compressai_environment_tpu.entropy.cdf import pmf_to_quantized_cdf_batch
from compressai_environment_tpu.entropy_models.base import CdfTables


def _wide_gaussian_tables(scales=(0.2, 1.5, 12.0, 80.0, 256.0), tail=1e-9):
    """Miniature GaussianConditional-style table set with genuinely wide
    rows (max stride ~3100)."""
    scales = np.asarray(scales, np.float64)
    mult = 6.0  # ~ -quantile(tail/2)
    centers = np.ceil(scales * mult).astype(np.int64)
    lengths = 2 * centers + 1
    max_len = int(lengths.max())
    xs = np.arange(max_len)[None, :] - centers[:, None]

    def phi(v):
        from math import erf

        return 0.5 * (1 + np.vectorize(erf)(v / np.sqrt(2.0)))

    pmf = phi((xs + 0.5) / scales[:, None]) - phi((xs - 0.5) / scales[:, None])
    tail_mass = 2 * phi((-centers[:, None] - 0.5) / scales[:, None])
    cdf = pmf_to_quantized_cdf_batch(
        pmf.astype(np.float32), tail_mass.astype(np.float32),
        lengths.astype(np.int32), max_len,
    )
    return CdfTables(cdf, lengths + 2, -centers)


@pytest.fixture(scope="module")
def tables():
    return _wide_gaussian_tables()


def test_folded_rows_invariants(tables):
    coarse, coarse_len, ks = vrans.build_folded_rows(
        tables.quantized_cdf, tables.cdf_length
    )
    maxv = tables.cdf_length.astype(np.int64) - 2
    assert ks.max() > 0  # the point of this fixture
    for r in range(coarse.shape[0]):
        k, L = int(ks[r]), int(coarse_len[r])
        pts = coarse[r, :L]
        assert pts[0] == 0 and pts[-1] == 1 << 16
        freqs = np.diff(pts)
        assert (freqs >= 1).all()
        if k:
            Q = -(-int(maxv[r]) >> k)
            assert L == Q + 2 <= vrans.ONEHOT_MAX_STRIDE
            # in-range bucket freqs are multiples of 2^k, each >= 2^k
            assert (freqs[:-1] % (1 << k) == 0).all()
            assert (freqs[:-1] >= (1 << k)).all()
            # escape keeps at least its original mass
            esc_orig = (
                tables.quantized_cdf[r, maxv[r] + 1]
                - tables.quantized_cdf[r, maxv[r]]
            )
            assert freqs[-1] >= esc_orig


def test_coding_cdf_is_valid_and_rate_close(tables):
    cdf2 = vrans.build_coding_cdf(
        tables.quantized_cdf, tables.cdf_length, tables.offset
    )
    assert cdf2 is not tables.quantized_cdf
    maxv = tables.cdf_length.astype(np.int64) - 2
    total_bits, total_bits2 = 0.0, 0.0
    for r in range(cdf2.shape[0]):
        L = int(tables.cdf_length[r])
        c1 = tables.quantized_cdf[r, :L].astype(np.int64)
        c2 = cdf2[r, :L].astype(np.int64)
        assert c2[0] == 0 and c2[-1] == 1 << 16
        f1, f2 = np.diff(c1), np.diff(c2)
        assert (f2 >= 1).all()
        # expected rate under the true (quantized) distribution
        p = f1 / 65536.0
        total_bits += -(p * np.log2(np.maximum(f1, 1) / 65536.0)).sum()
        total_bits2 += -(p * np.log2(f2 / 65536.0)).sum()
    # the fold costs well under 1% rate across the whole table set
    assert total_bits2 <= total_bits * 1.01


def test_narrow_tables_unfolded():
    cdf = np.array([[0, 30000, 65000, 65536, 0]], np.int32)
    lengths = np.array([4], np.int32)
    off = np.array([-1], np.int32)
    t = CdfTables(cdf, lengths, off)
    assert t.coding_cdf is t.quantized_cdf
    ct = vrans.build_compact_tables(cdf, lengths, off)
    assert ct is not None and (ct["dec_hi"][:, -1] * 256 + ct["dec_lo"][:, -1] == 0).all()


def _roundtrip(tables, symbols, indexes):
    import jax.numpy as jnp

    blobs = vrans.encode_batch_device(
        jnp.asarray(symbols), jnp.asarray(indexes), tables
    )
    out = vrans.decode_batch_device(blobs, np.asarray(indexes), tables)
    return blobs, np.asarray(out)


def test_device_roundtrip_folded(tables):
    assert tables.device_compact is not None
    rng = np.random.default_rng(0)
    B, n = 3, 4096
    indexes = rng.integers(0, tables.num_cdfs, size=(B, n)).astype(np.int32)
    scales = np.array([0.2, 1.5, 12.0, 80.0, 256.0])[indexes]
    symbols = np.round(
        rng.normal(0.0, scales)
    ).astype(np.int32)
    blobs, out = _roundtrip(tables, symbols, indexes)
    np.testing.assert_array_equal(out, symbols)


def test_device_roundtrip_with_escapes(tables):
    rng = np.random.default_rng(1)
    B, n = 2, 2048
    indexes = rng.integers(0, tables.num_cdfs, size=(B, n)).astype(np.int32)
    symbols = rng.integers(-40, 40, size=(B, n)).astype(np.int32)
    # out-of-table values in both directions for every row width
    symbols[:, ::97] = 5000
    symbols[:, 1::97] = -5000
    blobs, out = _roundtrip(tables, symbols, indexes)
    np.testing.assert_array_equal(out, symbols)


def test_host_fallback_byte_parity(tables):
    """encode_interleaved_batch over coding_cdf (the overflow-fallback path)
    must produce byte-identical blobs to the device folded cores, and the
    host decode must read device blobs."""
    rng = np.random.default_rng(2)
    B, n = 2, 3000
    indexes = rng.integers(0, tables.num_cdfs, size=(B, n)).astype(np.int32)
    symbols = rng.integers(-30, 30, size=(B, n)).astype(np.int32)

    import jax.numpy as jnp

    dev_blobs = vrans.encode_batch_device(
        jnp.asarray(symbols), jnp.asarray(indexes), tables
    )
    host_blobs = vrans.encode_interleaved_batch(
        symbols, indexes, tables.coding_cdf, tables.cdf_length, tables.offset
    )
    assert [bytes(b) for b in dev_blobs] == [bytes(b) for b in host_blobs]

    out = vrans.decode_interleaved_batch(
        dev_blobs, indexes, tables.coding_cdf, tables.cdf_length,
        tables.offset, lut=tables.coding_lut,
    )
    np.testing.assert_array_equal(out, symbols)


def test_gaussian_scale_table_now_compact():
    """The real 64-row Gaussian scale table folds onto the one-hot path."""
    from compressai_environment_tpu.entropy_models.gaussian import (
        build_tables, get_scale_table,
    )

    t = build_tables(get_scale_table())
    assert int(t.quantized_cdf.shape[1]) > vrans.ONEHOT_MAX_STRIDE
    assert t.device_compact is not None
    rng = np.random.default_rng(3)
    B, n = 2, 4096
    indexes = rng.integers(0, 64, size=(B, n)).astype(np.int32)
    scale_table = get_scale_table()
    symbols = np.round(
        rng.normal(0.0, scale_table[indexes])
    ).astype(np.int32)
    blobs, out = _roundtrip(t, symbols, indexes)
    np.testing.assert_array_equal(out, symbols)
    # rate sanity: within 2% of the ideal quantized-table rate
    f = np.diff(t.quantized_cdf.astype(np.int64), axis=1)
    maxv = t.cdf_length - 2
    coded = np.clip(symbols - t.offset[indexes], 0, maxv[indexes] - 1)
    ideal_bits = -np.log2(
        np.maximum(f[indexes, coded], 1) / 65536.0
    ).sum()
    real_bits = sum(len(b) for b in blobs) * 8
    assert real_bits <= ideal_bits * 1.02 + (32 * 6 + 17) * 8 * B
