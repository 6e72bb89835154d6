"""Mesh parallelism tests on the virtual 8-device CPU mesh: sharded training
step and data-parallel codec runs."""

import jax
import numpy as np
import pytest

from compressai_environment_tpu.models import FactorizedPrior, MeanScaleHyperprior
from compressai_environment_tpu.parallel import make_mesh, shard_batch
from compressai_environment_tpu.parallel.mesh import compress_data_parallel


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8, tp=1)


class TestDataParallelCodec:
    @pytest.mark.parametrize("fmt", ["rans", "tpu"])
    def test_dp_compress_matches_single_device(self, mesh, fmt):
        rng = np.random.default_rng(0)
        x = rng.random((8, 64, 64, 3), dtype=np.float32)
        m = FactorizedPrior(16, 24).init(key=jax.random.key(1), input_shape=(1, 64, 64, 3))
        m.update(force=True)
        m.stream_format = fmt

        ref = m.compress(x)
        dp = compress_data_parallel(m, x, mesh)
        assert dp["strings"][0] == ref["strings"][0]  # byte-identical, in order

        d = m.decompress(dp["strings"], dp["shape"])
        dref = m.decompress(ref["strings"], ref["shape"])
        np.testing.assert_allclose(
            np.asarray(d["x_hat"]), np.asarray(dref["x_hat"]), atol=1e-6
        )

    def test_dp_hyperprior(self, mesh):
        rng = np.random.default_rng(1)
        x = rng.random((8, 64, 64, 3), dtype=np.float32)
        m = MeanScaleHyperprior(16, 24).init(
            key=jax.random.key(2), input_shape=(1, 64, 64, 3)
        )
        m.update(force=True)
        m.stream_format = "tpu"
        ref = m.compress(x)
        dp = compress_data_parallel(m, x, mesh)
        assert dp["strings"][0] == ref["strings"][0]
        assert dp["strings"][1] == ref["strings"][1]


class TestMeshTrainStep:
    def test_tp_sharded_step_runs(self):
        from compressai_environment_tpu.parallel import make_sharded_train_step
        from compressai_environment_tpu.training import (
            init_train_state,
            rate_distortion_loss,
        )

        mesh = make_mesh(8, tp=2)
        m = FactorizedPrior(32, 64).init(key=jax.random.key(0), input_shape=(1, 64, 64, 3))
        state, txs = init_train_state(m.params)
        step = make_sharded_train_step(m.net, mesh, txs, 1e-2, rate_distortion_loss)
        state = step.place_state(state)
        batch = np.random.default_rng(0).random((4, 64, 64, 3), dtype=np.float32)
        state, losses = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(losses["loss"]))
