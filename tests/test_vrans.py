"""Interleaved-lane vectorized rANS tests: round trips, escapes, lane counts,
and compression-ratio sanity vs the single-stream reference coder."""

import numpy as np
import pytest

from compressai_environment_tpu.entropy import encode_with_indexes
from compressai_environment_tpu.entropy.cdf import pmf_to_quantized_cdf
from compressai_environment_tpu.entropy.vrans import (
    build_decode_lut,
    decode_interleaved,
    encode_interleaved,
)


def _table(rng, ncdfs=8, max_support=16):
    sizes = rng.integers(3, max_support + 2, size=ncdfs)
    stride = int(sizes.max()) + 1
    cdfs = np.zeros((ncdfs, stride), dtype=np.int32)
    for i, sz in enumerate(sizes):
        pmf = rng.random(int(sz) - 1).astype(np.float32) + 1e-3
        pmf = pmf / pmf.sum() * 0.9999
        row = pmf_to_quantized_cdf(pmf, 16)
        cdfs[i, : len(row)] = row
    offsets = rng.integers(-10, 10, size=ncdfs).astype(np.int32)
    return cdfs, sizes.astype(np.int32), offsets


class TestInterleavedRoundTrip:
    @pytest.mark.parametrize("n,lanes", [(10, 4), (1000, 16), (5000, 64), (513, 8)])
    def test_roundtrip(self, rng, n, lanes):
        cdfs, sizes, offsets = _table(rng)
        indexes = rng.integers(0, 8, size=n).astype(np.int32)
        max_vals = sizes[indexes] - 2
        symbols = (rng.random(n) * max_vals).astype(np.int32) + offsets[indexes]
        blob = encode_interleaved(symbols, indexes, cdfs, sizes, offsets, lanes)
        out = decode_interleaved(blob, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_roundtrip_with_escapes(self, rng):
        cdfs, sizes, offsets = _table(rng, ncdfs=4)
        n = 2000
        indexes = rng.integers(0, 4, size=n).astype(np.int32)
        symbols = rng.integers(-500, 500, size=n).astype(np.int32)
        blob = encode_interleaved(symbols, indexes, cdfs, sizes, offsets, lanes=32)
        out = decode_interleaved(blob, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_roundtrip_long_lane_schedule(self, rng):
        # T = n / lanes >= 2^15: the fused (key<<16 | word) sort compaction
        # key would overflow 16 bits, so _encode_scan_packed must take the
        # two-operand sort branch. Exercised with 2 lanes x 2*66000 symbols.
        cdfs, sizes, offsets = _table(rng, ncdfs=4)
        n = 132000
        indexes = rng.integers(0, 4, size=n).astype(np.int32)
        max_vals = sizes[indexes] - 2
        symbols = (rng.random(n) * max_vals).astype(np.int32) + offsets[indexes]
        blob = encode_interleaved(symbols, indexes, cdfs, sizes, offsets, lanes=2)
        out = decode_interleaved(blob, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_deterministic(self, rng):
        cdfs, sizes, offsets = _table(rng)
        indexes = rng.integers(0, 8, size=777).astype(np.int32)
        symbols = rng.integers(-20, 20, size=777).astype(np.int32)
        a = encode_interleaved(symbols, indexes, cdfs, sizes, offsets, 16)
        b = encode_interleaved(symbols, indexes, cdfs, sizes, offsets, 16)
        assert a == b

    def test_shaped_indexes(self, rng):
        cdfs, sizes, offsets = _table(rng)
        indexes = rng.integers(0, 8, size=(4, 8, 8)).astype(np.int32)
        symbols = rng.integers(-5, 5, size=(4, 8, 8)).astype(np.int32)
        blob = encode_interleaved(symbols, indexes, cdfs, sizes, offsets, 8)
        out = decode_interleaved(blob, indexes, cdfs, sizes, offsets)
        assert out.shape == (4, 8, 8)
        np.testing.assert_array_equal(out, symbols)

    def test_compression_ratio_close_to_reference(self, rng):
        """Interleaving costs ~4 bytes/lane of flush overhead; entropy
        efficiency must match the single-stream coder closely."""
        cdfs, sizes, offsets = _table(rng, ncdfs=8, max_support=12)
        n = 50000
        lanes = 64
        indexes = rng.integers(0, 8, size=n).astype(np.int32)
        max_vals = sizes[indexes] - 2
        symbols = (rng.random(n) * max_vals).astype(np.int32) + offsets[indexes]

        blob = encode_interleaved(symbols, indexes, cdfs, sizes, offsets, lanes)
        ref = encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
        # v2 header + packed counts (<=3B/lane worst case) + flush words
        overhead = 17 + 3 * lanes + 4 * lanes
        assert len(blob) <= len(ref) * 1.02 + overhead

    def test_lut(self, rng):
        cdfs, sizes, offsets = _table(rng)
        lut = build_decode_lut(cdfs, sizes)
        for i in range(len(sizes)):
            size = int(sizes[i])
            for cum in (0, 1, 100, 65535):
                s = lut[i, cum]
                assert cdfs[i, s] <= cum < cdfs[i, s + 1]


class TestBatchedInterleaved:
    def test_batch_matches_per_image(self, rng):
        from compressai_environment_tpu.entropy.vrans import (
            decode_interleaved_batch,
            encode_interleaved_batch,
        )

        cdfs, sizes, offsets = _table(rng)
        B, n, lanes = 3, 4000, 32
        indexes = rng.integers(0, 8, size=(B, n)).astype(np.int32)
        symbols = rng.integers(-100, 100, size=(B, n)).astype(np.int32)

        blobs = encode_interleaved_batch(symbols, indexes, cdfs, sizes, offsets, lanes)
        singles = [
            encode_interleaved(symbols[b], indexes[b], cdfs, sizes, offsets, lanes)
            for b in range(B)
        ]
        assert blobs == singles

        out = decode_interleaved_batch(blobs, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(out, symbols)


class TestDeviceResidentAPI:
    def test_device_encode_matches_host(self, rng):
        import jax.numpy as jnp

        from compressai_environment_tpu.entropy_models import CdfTables
        from compressai_environment_tpu.entropy.vrans import (
            decode_batch_device,
            encode_batch_device,
            encode_interleaved_batch,
        )

        cdfs, sizes, offsets = _table(rng)
        tables = CdfTables(cdfs, sizes, offsets)
        B, n, lanes = 2, 3000, 64
        indexes = rng.integers(0, 8, size=(B, n)).astype(np.int32)
        symbols = rng.integers(-100, 100, size=(B, n)).astype(np.int32)

        dev_blobs = encode_batch_device(
            jnp.asarray(symbols), jnp.asarray(indexes), tables, lanes
        )
        host_blobs = encode_interleaved_batch(
            symbols, indexes, cdfs, sizes, offsets, lanes
        )
        assert dev_blobs == host_blobs

        out = decode_batch_device(dev_blobs, jnp.asarray(indexes), tables)
        np.testing.assert_array_equal(np.asarray(out), symbols)


    def test_generic_fallback_when_tables_unpackable(self, rng):
        """Offsets outside int16 disable the packed tables; the generic
        device cores must produce identical blobs and round-trip."""
        import jax.numpy as jnp

        from compressai_environment_tpu.entropy_models import CdfTables
        from compressai_environment_tpu.entropy.vrans import (
            build_packed_tables,
            decode_batch_device,
            encode_batch_device,
            encode_interleaved_batch,
        )

        cdfs, sizes, offsets = _table(rng)
        offsets = (offsets + 40000).astype(np.int32)  # > int16 max
        assert build_packed_tables(cdfs, sizes, offsets) is None
        tables = CdfTables(cdfs, sizes, offsets)
        assert tables.device_packed is None

        B, n, lanes = 2, 1500, 32
        indexes = rng.integers(0, 8, size=(B, n)).astype(np.int32)
        symbols = (offsets[indexes] + rng.integers(-5, 20, size=(B, n))).astype(
            np.int32
        )
        dev_blobs = encode_batch_device(
            jnp.asarray(symbols), jnp.asarray(indexes), tables, lanes
        )
        host_blobs = encode_interleaved_batch(
            symbols, indexes, cdfs, sizes, offsets, lanes
        )
        assert dev_blobs == host_blobs
        out = decode_batch_device(dev_blobs, jnp.asarray(indexes), tables)
        np.testing.assert_array_equal(np.asarray(out), symbols)


class TestCompactOneHotPath:
    def test_compact_tables_selected_and_small(self, rng):
        """Small-stride tables use the gather-free one-hot coder: compact
        split-byte matrices only (~KBs), no 65536-wide LUT/sf/post set."""
        from compressai_environment_tpu.entropy_models import CdfTables
        from compressai_environment_tpu.entropy.vrans import build_compact_tables

        cdfs, sizes, offsets = _table(rng)
        tables = CdfTables(cdfs, sizes, offsets)
        assert tables.device_compact is not None
        b = tables.device_bytes()
        assert "lut" not in b and "sf" not in b
        assert b["total"] < 8 * (1 << 16)  # far below one LUT row

        # padded width does not matter, only cdf_length: this builds too
        wide = np.zeros((4, 300), np.int32)
        wide[:, :3] = [0, 30000, 65536]
        ct = build_compact_tables(wide, np.full(4, 3), np.zeros(4))
        assert ct is not None and ct["dec_hi"].shape[1] == 3 + 3

    def test_compact_exactness_vs_generic(self, rng):
        """One-hot split-byte matmul select is integer-exact: blobs and
        decoded symbols match the generic (pure-integer) cores, escapes
        included."""
        import jax.numpy as jnp

        from compressai_environment_tpu.entropy_models import CdfTables
        from compressai_environment_tpu.entropy.vrans import (
            decode_batch_device,
            encode_batch_device,
            encode_interleaved_batch,
        )

        cdfs, sizes, offsets = _table(rng)
        tables = CdfTables(cdfs, sizes, offsets)
        assert tables.device_compact is not None
        B, n, lanes = 3, 2500, 32
        indexes = rng.integers(0, 8, size=(B, n)).astype(np.int32)
        symbols = rng.integers(-300, 300, size=(B, n)).astype(np.int32)

        dev_blobs = encode_batch_device(
            jnp.asarray(symbols), jnp.asarray(indexes), tables, lanes
        )
        host_blobs = encode_interleaved_batch(
            symbols, indexes, cdfs, sizes, offsets, lanes
        )
        assert dev_blobs == host_blobs
        out = decode_batch_device(dev_blobs, jnp.asarray(indexes), tables)
        np.testing.assert_array_equal(np.asarray(out), symbols)


class TestLowMemoryMode:
    def test_low_mem_decode_matches(self, rng, monkeypatch):
        """COMPRESSAI_TPU_LOW_MEM=1 with a WIDE table. Since round 4 wide
        rows FOLD onto the compact one-hot path, both modes use the same
        ~KB split-byte tables (the 65536-wide LUT/sf/post set is never
        built); blobs and decoded symbols are identical across modes."""
        import jax.numpy as jnp

        from compressai_environment_tpu.entropy_models import CdfTables
        from compressai_environment_tpu.entropy.vrans import (
            decode_batch_device,
            encode_batch_device,
        )

        cdfs, sizes, offsets = _table(rng, ncdfs=8, max_support=300)
        B, n = 2, 2000
        indexes = rng.integers(0, 8, size=(B, n)).astype(np.int32)
        symbols = rng.integers(-60, 60, size=(B, n)).astype(np.int32)

        normal = CdfTables(cdfs, sizes, offsets)
        blobs = encode_batch_device(
            jnp.asarray(symbols), jnp.asarray(indexes), normal, 32
        )
        hi = normal.device_bytes()["total"]

        monkeypatch.setenv("COMPRESSAI_TPU_LOW_MEM", "1")
        lowmem = CdfTables(cdfs, sizes, offsets)
        assert lowmem.device_packed is None
        assert "lut" not in lowmem.device and "cdf_search" in lowmem.device

        # encoding is byte-identical in low-mem mode
        blobs_lm = encode_batch_device(
            jnp.asarray(symbols), jnp.asarray(indexes), lowmem, 32
        )
        assert blobs_lm == blobs

        out = decode_batch_device(blobs, jnp.asarray(indexes), lowmem)
        np.testing.assert_array_equal(np.asarray(out), symbols)

        lo = lowmem.device_bytes()["total"]
        assert lo == hi  # folding already made the normal mode compact
        assert lo < 8 * (1 << 16)  # far below one LUT row


class TestPerImageOverflowFallback:
    def test_only_overflowed_image_host_reencoded(self, rng):
        """A lane-count overflow in ONE image of a batched handle must not
        change the other images' blobs (round-4 advisor: a fused GOP handle
        folds many frames — whole-batch host fallback re-encoded the entire
        GOP for one pathological frame). Bytes stay identical either way;
        this pins the per-image blast radius."""
        import jax.numpy as jnp

        from compressai_environment_tpu.entropy import vrans
        from compressai_environment_tpu.entropy_models.base import CdfTables

        # one CDF row with a freq-1 symbol at index 1: coding it costs
        # ~16 bits/symbol, far past w_cap's ~10 bits/symbol budget
        cdf = np.array([[0, (1 << 16) - 2, (1 << 16) - 1, 1 << 16]], np.int32)
        tables = CdfTables(cdf, np.array([4], np.int32), np.array([0], np.int32))
        assert tables.device_compact is not None
        n, lanes = 512, 4
        idx = np.zeros((2, n), np.int32)
        syms = np.zeros((2, n), np.int32)
        syms[0] = 1  # image 0: all freq-1 symbols -> overflow
        # image 1: all high-freq symbols -> tiny stream, no overflow

        h = vrans.EncodeDeviceHandle(
            jnp.asarray(syms), jnp.asarray(idx), tables, lanes
        )
        assert bool(h._overflow)
        blobs = h.result()
        # all symbols round-trip
        out = vrans.decode_interleaved_batch(
            blobs, idx, tables.coding_cdf, tables.cdf_length, tables.offset
        )
        np.testing.assert_array_equal(out, syms)
        # the clean image's blob equals a fresh single-image device encode
        h1 = vrans.EncodeDeviceHandle(
            jnp.asarray(syms[1:]), jnp.asarray(idx[1:]), tables, lanes
        )
        assert not bool(h1._overflow)
        assert blobs[1] == h1.result()[0]
