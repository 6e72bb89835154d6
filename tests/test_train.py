"""Training tests: loss math, optimizer masking, short end-to-end training
runs for image and video (reference pattern: tests/test_train.py +
tests/test_eval_model.py end-to-end flow)."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from compressai_environment_tpu.models import FactorizedPrior
from compressai_environment_tpu.training import (
    init_train_state,
    rate_distortion_loss,
    train_step,
)
from compressai_environment_tpu.training.optim import quantiles_mask


@pytest.fixture(scope="module")
def fake_imagefolder(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("fakedata")
    (root / "train").mkdir()
    (root / "test").mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        arr = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "train" / f"img{i}.png")
    for i in range(2):
        arr = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "test" / f"img{i}.png")
    return root


class TestLoss:
    def test_rd_loss_components(self, rng):
        x = rng.random((2, 32, 32, 3)).astype(np.float32)
        out = {
            "x_hat": x + 0.1,
            "likelihoods": {"y": np.full((2, 2, 2, 4), 0.5, np.float32)},
        }
        losses = rate_distortion_loss(out, x, lmbda=0.01)
        # bpp: 32 one-bit symbols total / (2*32*32) pixels
        np.testing.assert_allclose(float(losses["bpp_loss"]), 32 / 2048, rtol=1e-5)
        np.testing.assert_allclose(float(losses["mse_loss"]), 0.01, rtol=1e-4)
        expected = 0.01 * 255**2 * 0.01 + 32 / 2048
        np.testing.assert_allclose(float(losses["loss"]), expected, rtol=1e-4)


class TestOptimizerMasking:
    def test_masks_are_disjoint_and_exhaustive(self):
        m = FactorizedPrior(8, 12).init(key=jax.random.key(0), input_shape=(1, 32, 32, 3))
        main_mask = quantiles_mask(m.params, invert=True)
        aux_mask = quantiles_mask(m.params, invert=False)
        leaves_main = jax.tree_util.tree_leaves(main_mask)
        leaves_aux = jax.tree_util.tree_leaves(aux_mask)
        assert all(a != b for a, b in zip(leaves_main, leaves_aux))
        assert sum(leaves_aux) == 1  # exactly the quantiles leaf

    def test_aux_step_only_touches_quantiles(self):
        m = FactorizedPrior(8, 12).init(key=jax.random.key(0), input_shape=(1, 32, 32, 3))
        state, txs = init_train_state(m.params)
        batch = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
        new_state, losses = jax.jit(
            lambda s, b, k: train_step(
                m.net, s, txs, b, k, 0.01, rate_distortion_loss
            )
        )(state, batch, jax.random.key(1))
        assert np.isfinite(float(losses["loss"]))
        assert np.isfinite(float(losses["aux_loss"]))
        # quantiles moved (aux opt) and conv weights moved (main opt)
        q0 = np.asarray(state.params["entropy_bottleneck"]["quantiles"])
        q1 = np.asarray(new_state.params["entropy_bottleneck"]["quantiles"])
        assert not np.allclose(q0, q1)
        k0 = np.asarray(state.params["g_a"]["0"]["kernel"])
        k1 = np.asarray(new_state.params["g_a"]["0"]["kernel"])
        assert not np.allclose(k0, k1)

    def test_loss_decreases_over_steps(self):
        m = FactorizedPrior(8, 12).init(key=jax.random.key(0), input_shape=(1, 32, 32, 3))
        state, txs = init_train_state(m.params, learning_rate=1e-3)
        step = jax.jit(
            lambda s, b, k: train_step(
                m.net, s, txs, b, k, 0.01, rate_distortion_loss
            )
        )
        rng = np.random.default_rng(0)
        batch = rng.random((4, 64, 64, 3)).astype(np.float32)
        first = None
        key = jax.random.key(0)
        for i in range(30):
            key, sub = jax.random.split(key)
            state, losses = step(state, batch, sub)
            if first is None:
                first = float(losses["loss"])
        assert float(losses["loss"]) < first


class TestTrainScript:
    def test_one_epoch_then_eval(self, fake_imagefolder, tmp_path, capsys, monkeypatch):
        """train -> export -> evaluate pipeline (reference
        tests/test_eval_model.py:127-176)."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "train_example",
            Path(__file__).resolve().parent.parent / "examples" / "train.py",
        )
        train = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(train)

        ckpt = tmp_path / "ckpt.msgpack"
        train.main([
            "-d", str(fake_imagefolder), "-e", "1",
            "--batch-size", "4", "--patch-size", "64", "64",
            "--quality", "1", "--save-path", str(ckpt),
        ])
        capsys.readouterr()
        assert ckpt.exists()

        from compressai_environment_tpu.utils.eval_model.__main__ import main as eval_main

        eval_main([
            "checkpoint", str(fake_imagefolder / "train"),
            "-a", "bmshj2018-factorized", "-p", str(ckpt),
        ])
        out = json.loads(capsys.readouterr().out)
        assert out["results"]["bpp"][0] > 0
