"""Spatial tiling tests: tile-wise transforms must be exactly equal to the
full-image transforms (halo covers the receptive field)."""

import jax
import numpy as np
import pytest

from compressai_environment_tpu.models import FactorizedPrior, ScaleHyperprior
from compressai_environment_tpu.parallel import make_mesh
from compressai_environment_tpu.parallel.tiles import tiled_analysis, tiled_synthesis
from compressai_environment_tpu.models.google import FactorizedPriorNet


@pytest.fixture(scope="module")
def model():
    return FactorizedPrior(16, 24).init(key=jax.random.key(3), input_shape=(1, 64, 64, 3))


def test_tiled_analysis_exact(model):
    rng = np.random.default_rng(0)
    x = rng.random((1, 128, 192, 3), dtype=np.float32)
    y_ref = model.net.apply(
        {"params": model.params}, x, method=FactorizedPriorNet.analysis
    )
    y_tiled = tiled_analysis(model, x, tile=64, halo=32)
    np.testing.assert_allclose(np.asarray(y_tiled), np.asarray(y_ref), atol=1e-6)


def test_tiled_analysis_non_divisible(model):
    rng = np.random.default_rng(1)
    x = rng.random((1, 96, 160, 3), dtype=np.float32)  # not multiples of 64
    y_ref = model.net.apply(
        {"params": model.params}, x, method=FactorizedPriorNet.analysis
    )
    y_tiled = tiled_analysis(model, x, tile=64, halo=32)
    np.testing.assert_allclose(np.asarray(y_tiled), np.asarray(y_ref), atol=1e-6)


def test_tiled_synthesis_exact(model):
    rng = np.random.default_rng(2)
    y = rng.standard_normal((1, 8, 12, 24)).astype(np.float32)
    x_ref = model.net.apply(
        {"params": model.params}, y, method=FactorizedPriorNet.synthesis
    )
    x_tiled = tiled_synthesis(model, y, tile=4, halo=4)
    np.testing.assert_allclose(
        np.asarray(x_tiled), np.asarray(x_ref), atol=1e-5
    )


def test_tiled_analysis_on_mesh(model):
    mesh = make_mesh(8, tp=1)
    rng = np.random.default_rng(3)
    x = rng.random((1, 512, 128, 3), dtype=np.float32)  # 8x1 tiles = dp extent
    y_ref = model.net.apply(
        {"params": model.params}, x, method=FactorizedPriorNet.analysis
    )
    y_tiled = tiled_analysis(model, x, tile=64, halo=32, mesh=mesh)
    np.testing.assert_allclose(np.asarray(y_tiled), np.asarray(y_ref), atol=1e-6)
