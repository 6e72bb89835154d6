"""Row-sequential (step-major) coder cores (round 4).

For channel-indexed tables (EntropyBottleneck) the CDF-row schedule is known
before coding; the planar step-major grid makes the row constant per scan
step, eliminating the one-hot select work entirely (measured 97 ms of the
24-image encode phase). These tests pin: grid math, roundtrips incl.
escapes and folded (wide-row) tables, step-major flagging, handle overflow
retry, and EB-level equivalence with the lane-blocked path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from compressai_environment_tpu.entropy import vrans
from compressai_environment_tpu.entropy_models.base import CdfTables


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _table(rng, ncdfs=12, max_support=24):
    sizes = rng.integers(6, max_support, size=ncdfs).astype(np.int32) + 2
    stride = int(sizes.max())
    cdfs = np.zeros((ncdfs, stride), np.int32)
    for i, L in enumerate(sizes):
        pmf = rng.random(int(L) - 2) + 0.05
        freqs = np.maximum((pmf / pmf.sum() * ((1 << 16) - (L - 2))), 1)
        freqs = np.round(freqs).astype(np.int64)
        freqs[-1] += (1 << 16) - freqs.sum() - 1
        cdfs[i, : L - 1] = np.concatenate([[0], np.cumsum(freqs)])
        cdfs[i, L - 1] = 1 << 16
    offsets = rng.integers(-12, 0, size=ncdfs).astype(np.int32)
    return CdfTables(cdfs, sizes, offsets)


def test_schedule_and_lanes():
    assert vrans.rowseq_lanes(192 * 1536, 1536) == 256
    assert vrans.rowseq_lanes(192 * 1536, 1535) is None  # odd hw
    assert vrans.rowseq_lanes(128 * 384, 384) == 16
    # small tensors target ~2048 sym/lane (< 128 Ki) and ~4096 (< 32 Ki)
    # for rate (round 5); below 8 lanes the step-major grid degenerates to
    # the lane-blocked path
    assert vrans.rowseq_lanes(128 * 96, 96) is None
    assert vrans.rowseq_lanes(512, 16) is None  # degenerate
    rows = vrans.rowseq_schedule(4, 64, 16)
    assert rows.shape == (16,)
    assert (rows == np.repeat(np.arange(4), 4)).all()


def _planar_roundtrip(tables, rng, C, hw, B=3, sym_lo=-20, sym_hi=20,
                      escapes=False):
    n = C * hw
    lanes = vrans.rowseq_lanes(n, hw)
    assert lanes is not None
    symbols = rng.integers(sym_lo, sym_hi, size=(B, n)).astype(np.int32)
    if escapes:
        symbols[:, ::53] = 4000
        symbols[:, 1::53] = -4000
    handle = vrans.encode_rowseq_async(
        jnp.asarray(symbols), C, hw, tables, lanes
    )
    blobs = handle.result()
    for b in blobs:
        assert vrans.blob_flags(b) & vrans._FLAG_STEPMAJOR
    out = vrans.decode_rowseq_batch(blobs, C, hw, tables)
    np.testing.assert_array_equal(np.asarray(out), symbols)
    return blobs, symbols


def test_roundtrip_basic(rng):
    _planar_roundtrip(_table(rng), rng, C=12, hw=4096)


def test_roundtrip_escapes(rng):
    _planar_roundtrip(_table(rng), rng, C=12, hw=4096, escapes=True)


def test_roundtrip_folded_wide_rows(rng):
    """Wide (folded, k>0) rows through the rowseq cores."""
    from tests.test_fold import _wide_gaussian_tables

    t = _wide_gaussian_tables()
    coarse, coarse_len, ks = vrans.build_folded_rows(
        t.quantized_cdf, t.cdf_length
    )
    assert ks.max() > 0
    C = t.num_cdfs
    rng2 = np.random.default_rng(11)
    hw = 8192
    n = C * hw
    scales = np.array([0.2, 1.5, 12.0, 80.0, 256.0])
    sym = np.concatenate(
        [np.round(rng2.normal(0, s, size=(2, hw))).astype(np.int32)
         for s in scales], axis=1,
    )
    lanes = vrans.rowseq_lanes(n, hw)
    handle = vrans.encode_rowseq_async(jnp.asarray(sym), C, hw, t, lanes)
    blobs = handle.result()
    out = vrans.decode_rowseq_batch(blobs, C, hw, t)
    np.testing.assert_array_equal(np.asarray(out), sym)


def test_overflow_retry(rng):
    """Near-incompressible symbols exceed the ~10-bit/symbol word budget;
    the handle re-dispatches at full capacity instead of host-falling-back
    (which would produce the wrong grid)."""
    ncdfs = 4
    sizes = np.full(ncdfs, 130, np.int32)
    cdfs = np.zeros((ncdfs, 130), np.int32)
    # uniform over 128 symbols -> ~14.5 bits/symbol when coding near-escape
    freqs = np.full(128, (1 << 16) // 400, np.int64)
    freqs[-1] = (1 << 16) - freqs[:-1].sum() - 1
    cdfs[:, :129] = np.concatenate([[0], np.cumsum(freqs)])
    cdfs[:, 129] = 1 << 16
    t = CdfTables(cdfs, sizes, np.zeros(ncdfs, np.int32))
    C, hw = ncdfs, 16384
    sym = rng.integers(0, 127, size=(2, C * hw)).astype(np.int32)
    handle = vrans.encode_rowseq_async(jnp.asarray(sym), C, hw, t)
    blobs = handle.result()
    out = vrans.decode_rowseq_batch(blobs, C, hw, t)
    np.testing.assert_array_equal(np.asarray(out), sym)


def test_eb_level_equivalence(rng):
    """EB compress/decompress via the rowseq path reconstructs identically
    to the lane-blocked device path (different bytes, same symbols)."""
    from compressai_environment_tpu.entropy_models import bottleneck as eb_ops

    t = _table(rng, ncdfs=8)
    B, H, W, C = 2, 64, 64, 8  # big enough that rowseq stays eligible
    med = rng.normal(0, 0.3, size=C).astype(np.float32)
    x = (rng.integers(-9, 9, size=(B, H, W, C)).astype(np.float32)
         + med.reshape(1, 1, 1, C))
    blobs = eb_ops.compress(x, med, t, fmt="tpu")
    assert vrans.blob_flags(blobs[0]) & vrans._FLAG_STEPMAJOR
    back = eb_ops.decompress(blobs, (H, W), med, t, fmt="tpu")
    np.testing.assert_allclose(
        np.asarray(back), np.round(x - med) + med, atol=1e-5
    )
