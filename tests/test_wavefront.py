"""Wavefront AR scheduler tests: symbol-exact equivalence with the serial
raster scan, across shapes including non-square grids."""

import jax
import numpy as np
import pytest

from compressai_environment_tpu.models import JointAutoregressiveHierarchicalPriors
from compressai_environment_tpu.parallel.wavefront import (
    ARWeightsDevice,
    wavefront_encode_symbols,
)


@pytest.fixture(scope="module")
def model():
    m = JointAutoregressiveHierarchicalPriors(16, 24).init(
        key=jax.random.key(5), input_shape=(1, 64, 64, 3)
    )
    m.update(force=True)
    return m


def _serial_reference(m, y, params_hs):
    """The host raster loop's symbols/indexes (ground truth)."""
    H, W, M = y.shape
    w8 = m._ar_weights()
    y_hat = np.zeros((H + 4, W + 4, M), np.float32)
    y_hat[2 : 2 + H, 2 : 2 + W] = y
    symbols = np.empty((H, W, M), np.int32)
    indexes = np.empty((H, W, M), np.int32)
    for h in range(H):
        for w in range(W):
            crop = y_hat[h : h + 5, w : w + 5, :]
            ctx = crop.reshape(1, -1) @ w8.ctx_kernel + w8.ctx_bias
            p = params_hs[h, w][None, :]
            gp = w8.entropy_parameters(np.concatenate((p, ctx), axis=1))[0]
            scales, means = gp[:M], gp[M:]
            # the device wavefront snaps scales near the 0.11 clamp onto it
            # (wavefront._scale_indexes) so the encode and decode programs
            # can't flip a CDF row on a 1-ULP GEMM difference; the serial
            # comparator applies the same rule. (The rans-format host path
            # keeps raw reference semantics — see models/joint_ar.py.)
            scales = np.where(np.abs(scales - 0.11) < 1e-4, 0.11, scales)
            idx = np.searchsorted(
                m.scale_table[:-1], np.maximum(scales, 0.11), side="left"
            )
            y_q = np.round(y[h, w] - means).astype(np.int32)
            y_hat[h + 2, w + 2] = y_q + means
            symbols[h, w] = y_q
            indexes[h, w] = idx
    return symbols, indexes, y_hat[2 : 2 + H, 2 : 2 + W]


@pytest.mark.parametrize("H,W", [(4, 4), (3, 7), (8, 5)])
def test_wavefront_matches_serial(model, H, W):
    rng = np.random.default_rng(42)
    M = model.M
    y = (rng.standard_normal((H, W, M)) * 2).astype(np.float32)
    params_hs = rng.standard_normal((H, W, 2 * M)).astype(np.float32)

    ref_sym, ref_idx, ref_yhat = _serial_reference(model, y, params_hs)

    w8 = ARWeightsDevice(model.params, M)
    sym, idx, y_hat = wavefront_encode_symbols(
        y, params_hs, w8, model.scale_table
    )
    np.testing.assert_array_equal(np.asarray(sym), ref_sym)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(y_hat), ref_yhat, atol=1e-4)
