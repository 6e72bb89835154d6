"""Lane-parallel AR stream format: encode_ar_lanes + wavefront_decode must
reproduce the encoder's y_hat exactly, including escape symbols."""

import jax
import numpy as np
import pytest

from compressai_environment_tpu.models import JointAutoregressiveHierarchicalPriors
from compressai_environment_tpu.parallel.wavefront import (
    ARWeightsDevice,
    encode_ar_lanes,
    encode_ar_lanes_device,
    wavefront_decode,
    wavefront_encode_symbols,
)


@pytest.fixture(scope="module")
def model():
    m = JointAutoregressiveHierarchicalPriors(16, 24).init(
        key=jax.random.key(5), input_shape=(1, 64, 64, 3)
    )
    m.update(force=True)
    return m


@pytest.mark.parametrize("H,W,scale", [(4, 4, 2.0), (6, 9, 2.0), (5, 5, 30.0)])
def test_lane_roundtrip(model, H, W, scale):
    """scale=30 drives many symbols out of CDF range -> escape path."""
    rng = np.random.default_rng(7)
    M = model.M
    y = (rng.standard_normal((H, W, M)) * scale).astype(np.float32)
    params_hs = rng.standard_normal((H, W, 2 * M)).astype(np.float32)

    w8 = ARWeightsDevice(model.params, M)
    tables = model.tables["y"]

    symbols, indexes, y_hat_enc = wavefront_encode_symbols(
        y, params_hs, w8, model.scale_table
    )
    blob = encode_ar_lanes(np.asarray(symbols), np.asarray(indexes), tables)

    y_hat_dec = wavefront_decode(
        blob, params_hs, w8, tables, model.scale_table, H, W
    )
    np.testing.assert_allclose(
        np.asarray(y_hat_dec), np.asarray(y_hat_enc), atol=1e-5
    )


@pytest.mark.parametrize("H,W,scale", [(4, 4, 2.0), (6, 9, 2.0), (5, 5, 30.0)])
def test_device_lane_encode_byte_identical(model, H, W, scale):
    """encode_ar_lanes_device (on-device compaction) must produce exactly
    the bytes of the host encode_ar_lanes, escapes included."""
    rng = np.random.default_rng(11)
    M = model.M
    y = (rng.standard_normal((H, W, M)) * scale).astype(np.float32)
    params_hs = rng.standard_normal((H, W, 2 * M)).astype(np.float32)
    w8 = ARWeightsDevice(model.params, M)
    tables = model.tables["y"]
    symbols, indexes, _ = wavefront_encode_symbols(y, params_hs, w8, model.scale_table)
    host = encode_ar_lanes(np.asarray(symbols), np.asarray(indexes), tables)
    dev = encode_ar_lanes_device(symbols, indexes, tables)
    assert dev == host


def test_blob_smaller_than_raw(model):
    rng = np.random.default_rng(3)
    H, W, M = 8, 8, model.M
    y = (rng.standard_normal((H, W, M)) * 0.5).astype(np.float32)
    params_hs = (rng.standard_normal((H, W, 2 * M)) * 0.1).astype(np.float32)
    w8 = ARWeightsDevice(model.params, M)
    symbols, indexes, _ = wavefront_encode_symbols(y, params_hs, w8, model.scale_table)
    blob = encode_ar_lanes(np.asarray(symbols), np.asarray(indexes), model.tables["y"])
    assert len(blob) < H * W * M * 4  # beats raw int32 at least


@pytest.mark.parametrize("scale", [2.0, 30.0])
def test_batched_packed_decode_matches_unpacked(model, scale):
    """The gather-lean batched decode (packed sf/post tables + contiguous
    window lane slicing) must be state-identical to the unpacked batched
    path and to per-image wavefront_decode — scale=30 forces the in-band
    escape branch."""
    from compressai_environment_tpu.parallel.wavefront import (
        encode_ar_lanes_device_batch,
        wavefront_decode_batch,
        wavefront_encode_symbols_batch,
    )

    rng = np.random.default_rng(13)
    B, H, W, M = 3, 6, 9, model.M
    y = (rng.standard_normal((B, H, W, M)) * scale).astype(np.float32)
    params_hs = rng.standard_normal((B, H, W, 2 * M)).astype(np.float32)
    w8 = ARWeightsDevice(model.params, M)
    tables = model.tables["y"]

    symbols, indexes, y_hat_enc = wavefront_encode_symbols_batch(
        y, params_hs, w8, model.scale_table
    )
    blobs = encode_ar_lanes_device_batch(symbols, indexes, tables)

    assert tables.device_packed is not None  # packed path is live
    y_packed = np.asarray(
        wavefront_decode_batch(blobs, params_hs, w8, tables,
                               model.scale_table, H, W)
    )
    # force the unpacked batched path on a fresh table object
    import dataclasses
    t2 = dataclasses.replace(tables)
    object.__setattr__(t2, "_device_packed", None)
    y_unpacked = np.asarray(
        wavefront_decode_batch(blobs, params_hs, w8, t2,
                               model.scale_table, H, W)
    )
    np.testing.assert_array_equal(y_packed, y_unpacked)
    np.testing.assert_allclose(y_packed, np.asarray(y_hat_enc), atol=1e-5)

    for b in range(B):
        y_single = wavefront_decode(
            blobs[b], params_hs[b], w8, tables, model.scale_table, H, W
        )
        np.testing.assert_allclose(y_packed[b], np.asarray(y_single), atol=1e-5)


@pytest.mark.parametrize("H,W,scale", [(4, 4, 2.0), (6, 9, 2.0), (5, 5, 30.0)])
def test_chan_lane_roundtrip(model, H, W, scale):
    """Channel-lane format (one rANS lane per channel, wavefront pop
    order): encode + decode must reproduce the encoder's y_hat exactly,
    escapes included (scale=30 forces the escape path)."""
    from compressai_environment_tpu.parallel.wavefront import (
        encode_ar_chan_device_batch,
        wavefront_decode_batch,
        wavefront_encode_symbols_batch,
    )

    rng = np.random.default_rng(17)
    B, M = 2, model.M
    y = (rng.standard_normal((B, H, W, M)) * scale).astype(np.float32)
    params_hs = rng.standard_normal((B, H, W, 2 * M)).astype(np.float32)
    w8 = ARWeightsDevice(model.params, M)
    tables = model.tables["y"]

    symbols, indexes, y_hat_enc = wavefront_encode_symbols_batch(
        y, params_hs, w8, model.scale_table
    )
    blobs = encode_ar_chan_device_batch(symbols, indexes, tables)
    # container overhead is per-channel, not per-(row, channel)
    header = np.frombuffer(blobs[0][:8], dtype="<u4")
    assert int(header[1]) == M | 0x80000000

    y_hat_dec = wavefront_decode_batch(
        blobs, params_hs, w8, tables, model.scale_table, H, W
    )
    np.testing.assert_allclose(
        np.asarray(y_hat_dec), np.asarray(y_hat_enc), atol=1e-5
    )


@pytest.mark.parametrize("scale", [2.0, 30.0])
def test_chan_lane_host_device_byte_identical(model, scale):
    """The host channel-lane encoder (overflow fallback) must emit exactly
    the device core's bytes."""
    from compressai_environment_tpu.parallel.wavefront import (
        encode_ar_chan_device_batch,
        encode_ar_chan_host,
        wavefront_encode_symbols_batch,
    )

    rng = np.random.default_rng(19)
    B, H, W, M = 2, 6, 9, model.M
    y = (rng.standard_normal((B, H, W, M)) * scale).astype(np.float32)
    params_hs = rng.standard_normal((B, H, W, 2 * M)).astype(np.float32)
    w8 = ARWeightsDevice(model.params, M)
    tables = model.tables["y"]
    symbols, indexes, _ = wavefront_encode_symbols_batch(
        y, params_hs, w8, model.scale_table
    )
    dev = encode_ar_chan_device_batch(symbols, indexes, tables)
    for b in range(B):
        host = encode_ar_chan_host(
            np.asarray(symbols[b]), np.asarray(indexes[b]), tables
        )
        assert dev[b] == host
