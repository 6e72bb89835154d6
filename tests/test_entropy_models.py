"""Entropy model tests: forward contracts, round trips through real rANS
coding, and scale-table index construction (mirrors reference
tests/test_entropy_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressai_environment_tpu.entropy_models import (
    EntropyBottleneck,
    GaussianConditional,
    build_indexes,
    get_scale_table,
)
from compressai_environment_tpu.entropy_models import bottleneck as eb_mod
from compressai_environment_tpu.entropy_models import gaussian as gc_mod


@pytest.fixture(scope="module")
def eb():
    module = EntropyBottleneck(channels=8)
    x = jnp.zeros((1, 4, 4, 8))
    variables = module.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
    )
    return module, variables["params"]


class TestEntropyBottleneck:
    def test_forward_training_noise_bounded(self, eb, rng):
        module, params = eb
        x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
        y, lik = module.apply(
            {"params": params}, x, True, jax.random.key(3)
        )
        assert y.shape == x.shape and lik.shape == x.shape
        assert jnp.max(jnp.abs(y - x)) <= 0.5
        assert jnp.all(lik > 0) and jnp.all(lik <= 1.0)

    def test_forward_eval_rounds_around_medians(self, eb, rng):
        module, params = eb
        x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
        y, _ = module.apply({"params": params}, x, False)
        medians = np.asarray(params["quantiles"])[:, 0, 1]
        expected = np.round(np.asarray(x) - medians) + medians
        np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)

    def test_roundtrip_through_rans(self, eb, rng):
        module, params = eb
        tables = eb_mod.build_tables(module, params)
        medians = np.asarray(params["quantiles"])[:, 0, 1]
        x = rng.standard_normal((3, 5, 7, 8)).astype(np.float32) * 2
        strings = eb_mod.compress(x, medians, tables)
        assert len(strings) == 3
        out = eb_mod.decompress(strings, (5, 7), medians, tables)
        expected = np.round(x - medians) + medians
        np.testing.assert_allclose(out, expected, atol=1e-5)

    @pytest.mark.parametrize("spatial", [(), (4,), (4, 4), (2, 4, 4)])
    def test_roundtrip_various_ranks(self, eb, rng, spatial):
        """Reference covers 0-D through 5-D latents
        (tests/test_entropy_models.py:258-283)."""
        module, params = eb
        tables = eb_mod.build_tables(module, params)
        medians = np.asarray(params["quantiles"])[:, 0, 1]
        x = rng.standard_normal((2, *spatial, 8)).astype(np.float32) * 3
        strings = eb_mod.compress(x, medians, tables)
        out = eb_mod.decompress(strings, spatial, medians, tables)
        np.testing.assert_allclose(out, np.round(x - medians) + medians, atol=1e-5)

    def test_aux_loss_finite_positive(self, eb):
        module, params = eb
        loss = module.apply({"params": params}, method=EntropyBottleneck.aux_loss)
        assert np.isfinite(float(loss)) and float(loss) >= 0

    def test_table_invariants(self, eb):
        module, params = eb
        tables = eb_mod.build_tables(module, params)
        assert tables.quantized_cdf.shape[0] == 8
        assert np.all(tables.cdf_length >= 3)
        for i in range(8):
            row = tables.quantized_cdf[i, : tables.cdf_length[i]]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) > 0)


class TestGaussianConditional:
    def test_forward_shapes_and_bounds(self, rng):
        gc = GaussianConditional()
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        scales = jnp.abs(jnp.asarray(rng.standard_normal((2, 8, 8, 4)))).astype(
            jnp.float32
        ) + 0.2
        means = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        y, lik = gc.apply({}, x, scales, means, True, jax.random.key(0))
        assert y.shape == x.shape
        assert jnp.all(lik > 0) and jnp.all(lik <= 1.0)
        y2, _ = gc.apply({}, x, scales, means, False)
        np.testing.assert_allclose(
            np.asarray(y2),
            np.round(np.asarray(x - means)) + np.asarray(means),
            atol=1e-5,
        )

    def test_build_indexes_matches_reference_loop(self, rng):
        table = get_scale_table()
        scales = np.abs(rng.standard_normal((2, 4, 4, 3)).astype(np.float32)) * 50
        idx = np.asarray(build_indexes(jnp.asarray(scales), table))
        # reference loop: start at len-1, subtract (scales <= s) per entry
        expected = np.full(scales.shape, len(table) - 1, np.int32)
        bounded = np.maximum(scales, 0.11)
        for s in table[:-1]:
            expected -= (bounded <= s).astype(np.int32)
        np.testing.assert_array_equal(idx, expected)
        # every selected scale >= the bounded scale (defining property)
        assert np.all(table[idx] >= bounded - 1e-6)

    def test_roundtrip_through_rans(self, rng):
        table = get_scale_table()
        tables = gc_mod.build_tables(table)
        scales = np.abs(rng.standard_normal((2, 6, 6, 4)).astype(np.float32)) * 3 + 0.15
        means = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)
        x = rng.standard_normal((2, 6, 6, 4)).astype(np.float32) * 4
        indexes = np.asarray(build_indexes(jnp.asarray(scales), table))
        strings = gc_mod.compress(x, indexes, tables, means)
        out = gc_mod.decompress(strings, indexes, tables, means)
        np.testing.assert_allclose(out, np.round(x - means) + means, atol=1e-5)

    def test_tables_match_scale_count(self):
        table = get_scale_table()
        tables = gc_mod.build_tables(table)
        assert tables.num_cdfs == len(table)
        assert np.all(tables.offset == -((tables.cdf_length - 2 - 1) // 2))
