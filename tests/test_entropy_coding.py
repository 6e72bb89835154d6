"""Entropy-coding core tests: CDF quantizer golden values and rANS round trips.

Mirrors the reference test strategy (tests/test_ops.py golden CDF values;
round-trip property tests from tests/test_entropy_models.py) plus
cross-validation between the pure-Python spec coder and the C++ host coder.
"""

import numpy as np
import pytest

from compressai_environment_tpu.entropy import (
    decode_batch,
    decode_with_indexes,
    encode_batch,
    encode_with_indexes,
    pmf_to_quantized_cdf,
)
from compressai_environment_tpu.entropy import coder as coder_mod
from compressai_environment_tpu.entropy import rans as pyrans
from compressai_environment_tpu.entropy._native import native_available


class TestPmfToQuantizedCdf:
    def test_golden_value(self):
        # Reference golden: tests/test_ops.py:104-106
        out = pmf_to_quantized_cdf([0.1, 0.2, 0, 0], 16)
        assert out.tolist() == [0, 21845, 65534, 65535, 65536]

    def test_invariants(self, rng):
        for _ in range(50):
            n = int(rng.integers(2, 40))
            pmf = rng.random(n).astype(np.float32)
            pmf /= pmf.sum() * rng.uniform(1.0, 2.0)  # leave some tail mass
            cdf = pmf_to_quantized_cdf(pmf, 16)
            assert cdf[0] == 0
            assert cdf[-1] == 1 << 16
            assert np.all(np.diff(cdf) > 0)

    def test_rejects_negative(self):
        with pytest.raises(ValueError):
            pmf_to_quantized_cdf([0.1, -0.2, 0.3], 16)

    def test_rejects_nan(self):
        with pytest.raises(ValueError):
            pmf_to_quantized_cdf([0.1, np.nan, 0.3], 16)

    def test_rejects_zero_total(self):
        with pytest.raises(ValueError):
            pmf_to_quantized_cdf([0.0, 0.0], 16)


def _random_cdf_table(rng, ncdfs, max_support=16):
    """Build a padded CDF table like EntropyModel update() produces."""
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


class TestRansRoundTrip:
    @pytest.mark.parametrize("n", [1, 7, 100, 5000])
    def test_roundtrip_in_range(self, rng, n):
        cdfs, sizes, offsets = _random_cdf_table(rng, ncdfs=8)
        indexes = rng.integers(0, 8, size=n).astype(np.int32)
        # symbols within each cdf's representable range
        max_vals = sizes[indexes] - 2
        symbols = (rng.random(n) * max_vals).astype(np.int32) + offsets[indexes]
        s = encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
        out = decode_with_indexes(s, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_roundtrip_bypass_escapes(self, rng):
        """Out-of-range symbols exercise the 4-bit bypass path."""
        cdfs, sizes, offsets = _random_cdf_table(rng, ncdfs=4)
        n = 500
        indexes = rng.integers(0, 4, size=n).astype(np.int32)
        symbols = rng.integers(-1000, 1000, size=n).astype(np.int32)
        s = encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
        out = decode_with_indexes(s, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_roundtrip_extreme_values(self, rng):
        cdfs, sizes, offsets = _random_cdf_table(rng, ncdfs=2)
        symbols = np.array([0, 2**20, -(2**20), 1, -1], dtype=np.int32)
        indexes = np.zeros(5, dtype=np.int32)
        s = encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
        out = decode_with_indexes(s, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_batch_matches_single(self, rng):
        cdfs, sizes, offsets = _random_cdf_table(rng, ncdfs=8)
        batch, n = 4, 300
        indexes = rng.integers(0, 8, size=(batch, n)).astype(np.int32)
        symbols = rng.integers(-50, 50, size=(batch, n)).astype(np.int32)
        strings = encode_batch(symbols, indexes, cdfs, sizes, offsets)
        singles = [
            encode_with_indexes(symbols[b], indexes[b], cdfs, sizes, offsets)
            for b in range(batch)
        ]
        assert strings == singles
        out = decode_batch(strings, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(out, symbols)


@pytest.mark.skipif(not native_available(), reason="native coder unavailable")
class TestNativeVsSpec:
    """The C++ coder must produce byte-identical streams to the Python spec."""

    def test_encode_bytes_identical(self, rng):
        cdfs, sizes, offsets = _random_cdf_table(rng, ncdfs=8)
        n = 2000
        indexes = rng.integers(0, 8, size=n).astype(np.int32)
        symbols = rng.integers(-300, 300, size=n).astype(np.int32)
        native = encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
        spec = pyrans.RansEncoder().encode_with_indexes(
            symbols, indexes, cdfs, sizes, offsets
        )
        assert native == spec

    def test_decode_cross(self, rng):
        cdfs, sizes, offsets = _random_cdf_table(rng, ncdfs=8)
        n = 1000
        indexes = rng.integers(0, 8, size=n).astype(np.int32)
        symbols = rng.integers(-300, 300, size=n).astype(np.int32)
        s = pyrans.RansEncoder().encode_with_indexes(
            symbols, indexes, cdfs, sizes, offsets
        )
        out_native = decode_with_indexes(s, indexes, cdfs, sizes, offsets)
        out_spec = pyrans.RansDecoder().decode_with_indexes(
            s, indexes, cdfs, sizes, offsets
        )
        np.testing.assert_array_equal(out_native, symbols)
        np.testing.assert_array_equal(out_spec, symbols)


class TestIncremental:
    def test_buffered_encoder_matches_oneshot(self, rng):
        cdfs, sizes, offsets = _random_cdf_table(rng, ncdfs=4)
        n = 600
        indexes = rng.integers(0, 4, size=n).astype(np.int32)
        symbols = rng.integers(-40, 40, size=n).astype(np.int32)

        enc = coder_mod.BufferedEncoder()
        for i in range(0, n, 37):  # uneven chunks, like per-pixel AR calls
            enc.encode_with_indexes(
                symbols[i : i + 37], indexes[i : i + 37], cdfs, sizes, offsets
            )
        chunked = enc.flush()
        oneshot = encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
        assert chunked == oneshot

    def test_stream_decoder_incremental(self, rng):
        cdfs, sizes, offsets = _random_cdf_table(rng, ncdfs=4)
        n = 600
        indexes = rng.integers(0, 4, size=n).astype(np.int32)
        symbols = rng.integers(-40, 40, size=n).astype(np.int32)
        s = encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)

        dec = coder_mod.StreamDecoder(s)
        outs = []
        for i in range(0, n, 41):
            outs.append(
                dec.decode_stream(indexes[i : i + 41], cdfs, sizes, offsets)
            )
        np.testing.assert_array_equal(np.concatenate(outs), symbols)


def test_validated_debug_build(tmp_path):
    """COMPRESSAI_TPU_DEBUG_BUILD=1 (the reference DEBUG_BUILD analogue,
    setup.py:72-73) compiles the coder with CDF validation: malformed tables
    are rejected with an error instead of emitting corrupt streams. Run in a
    subprocess so the library cache of this process is untouched."""
    import subprocess
    import sys
    import textwrap
    from pathlib import Path

    script = tmp_path / "dbg.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["COMPRESSAI_TPU_DEBUG_BUILD"] = "1"
        sys.path.insert(0, {str(Path(__file__).parent.parent)!r})
        import numpy as np
        from compressai_environment_tpu.entropy import coder
        from compressai_environment_tpu.entropy.cdf import pmf_to_quantized_cdf

        row = pmf_to_quantized_cdf([0.2, 0.3, 0.4], 16)
        cdfs = np.zeros((1, len(row)), np.int32); cdfs[0] = row
        sizes = np.array([len(row)], np.int32)
        offs = np.array([0], np.int32)
        sym = np.array([0, 1, 2, 1], np.int32)
        idx = np.zeros(4, np.int32)
        s = coder.encode_with_indexes(sym, idx, cdfs, sizes, offs)
        assert (coder.decode_with_indexes(s, idx, cdfs, sizes, offs) == sym).all()

        bad = cdfs.copy(); bad[0, 1] = bad[0, 2]  # non-monotone row
        try:
            coder.encode_with_indexes(sym, idx, bad, sizes, offs)
            raise SystemExit("unvalidated")
        except ValueError:
            print("validated-build-ok")
    """))
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=240,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "validated-build-ok" in out.stdout
