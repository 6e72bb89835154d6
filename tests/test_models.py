"""Model-level tests: forward output contracts for every architecture and
compress→decompress consistency against the direct eval path (mirrors
reference tests/test_models.py shape contracts plus round-trip checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressai_environment_tpu.models import (
    Cheng2020Anchor,
    Cheng2020Attention,
    FactorizedPrior,
    JointAutoregressiveHierarchicalPriors,
    MeanScaleHyperprior,
    ScaleHyperprior,
)

SHAPE = (1, 64, 64, 3)


def _make(cls, *args):
    return cls(*args).init(key=jax.random.key(42), input_shape=SHAPE)


def _kw(compressed):
    return {"strings": compressed["strings"], "shape": compressed["shape"]}


@pytest.fixture(scope="module")
def image(rng_mod=np.random.default_rng(7)):
    return rng_mod.random(SHAPE, dtype=np.float32)


class TestForwardContracts:
    @pytest.mark.parametrize(
        "cls,args,factor,has_z",
        [
            (FactorizedPrior, (16, 24), 16, False),
            (ScaleHyperprior, (16, 24), 64, True),
            (MeanScaleHyperprior, (16, 24), 64, True),
            (JointAutoregressiveHierarchicalPriors, (16, 24), 64, True),
            (Cheng2020Anchor, (16,), 64, True),
            (Cheng2020Attention, (16,), 64, True),
        ],
    )
    def test_forward_shapes(self, image, cls, args, factor, has_z):
        m = _make(cls, *args)
        out = m.forward(image, training=True, key=jax.random.key(0))
        assert out["x_hat"].shape == SHAPE
        assert "y" in out["likelihoods"]
        y_lik = out["likelihoods"]["y"]
        assert y_lik.shape[1] == SHAPE[1] // 16 and y_lik.shape[2] == SHAPE[2] // 16
        if has_z:
            z_lik = out["likelihoods"]["z"]
            assert z_lik.shape[1] == SHAPE[1] // factor
        assert float(m.aux_loss()) >= 0
        assert m.downsampling_factor == factor

    def test_forward_eval_deterministic(self, image):
        m = _make(FactorizedPrior, 16, 24)
        a = m.forward(image, training=False)
        b = m.forward(image, training=False)
        np.testing.assert_array_equal(np.asarray(a["x_hat"]), np.asarray(b["x_hat"]))


class TestCodecRoundTrip:
    @pytest.mark.parametrize(
        "cls,args",
        [
            (FactorizedPrior, (16, 24)),
            (ScaleHyperprior, (16, 24)),
            (MeanScaleHyperprior, (16, 24)),
        ],
    )
    def test_roundtrip_matches_eval_forward(self, image, cls, args):
        """decompress(compress(x)).x_hat must equal the deterministic eval
        reconstruction computed without any entropy coding."""
        m = _make(cls, *args)
        m.update(force=True)
        c = m.compress(image)
        d = m.decompress(c["strings"], c["shape"])
        ref = m.forward(image, training=False)
        np.testing.assert_allclose(
            np.asarray(d["x_hat"]),
            np.clip(np.asarray(ref["x_hat"]), 0, 1),
            atol=1e-5,
        )

    @pytest.mark.parametrize(
        "cls,args",
        [(FactorizedPrior, (16, 24)), (MeanScaleHyperprior, (16, 24))],
    )
    def test_tpu_stream_format_roundtrip(self, image, cls, args):
        """The interleaved-lane on-chip coder must reconstruct identically to
        the reference-format host coder."""
        m = _make(cls, *args)
        m.update(force=True)
        ref = m.decompress(**_kw(m.compress(image)))
        m.stream_format = "tpu"
        c = m.compress(image)
        d = m.decompress(c["strings"], c["shape"])
        np.testing.assert_allclose(
            np.asarray(d["x_hat"]), np.asarray(ref["x_hat"]), atol=1e-6
        )

    def test_compress_requires_update(self, image):
        m = _make(FactorizedPrior, 16, 24)
        with pytest.raises(ValueError, match="update"):
            m.compress(image)

    @pytest.mark.parametrize(
        "cls,args", [(FactorizedPrior, (16, 24)), (MeanScaleHyperprior, (16, 24))]
    )
    def test_half_precision_roundtrip(self, image, cls, args):
        """half() (bfloat16 transforms; reference --half is fp16 —
        eval_model/__main__.py:174-176) must round-trip close to the fp32
        reconstruction."""
        m = _make(cls, *args)
        m.update(force=True)
        ref = np.asarray(m.decompress(**_kw(m.compress(image)))["x_hat"])
        m.half()
        assert m.params["g_a"]["0"]["kernel"].dtype == jnp.bfloat16
        c = m.compress(image)
        out = np.asarray(m.decompress(c["strings"], c["shape"])["x_hat"])
        assert out.dtype == np.float32
        # bf16 transforms: reconstructions agree to ~1e-2
        assert np.max(np.abs(out - ref)) < 5e-2

    def test_batched_roundtrip(self):
        rng = np.random.default_rng(3)
        x = rng.random((3, 64, 64, 3), dtype=np.float32)
        m = _make(MeanScaleHyperprior, 16, 24)
        m.update(force=True)
        c = m.compress(x)
        assert len(c["strings"][0]) == 3 and len(c["strings"][1]) == 3
        d = m.decompress(c["strings"], c["shape"])
        ref = np.clip(np.asarray(m.forward(x, training=False)["x_hat"]), 0, 1)
        np.testing.assert_allclose(np.asarray(d["x_hat"]), ref, atol=1e-5)

    def test_chunked_synthesis_decode_large_batch(self):
        """Batches above the fused-decode chunk threshold (32) run the
        synthesis as a lax.map over sub-batches inside one jit; the result
        must equal the small-batch path image-for-image (round-5 VERDICT
        item 5: batch-96 decode OOMed 16 GB HBM single-shot)."""
        rng = np.random.default_rng(4)
        x = rng.random((40, 32, 32, 3), dtype=np.float32)
        m = _make(FactorizedPrior, 16, 24)
        m.update(force=True)
        m.stream_format = "tpu"
        c = m.compress(x)
        d_big = m.decompress(c["strings"], c["shape"])  # 40 > 32: chunked
        c_small = m.compress(x[:8])
        d_small = m.decompress(c_small["strings"], c_small["shape"])
        np.testing.assert_allclose(
            np.asarray(d_big["x_hat"])[:8], np.asarray(d_small["x_hat"]),
            atol=1e-6,
        )


class TestAutoregressiveRoundTrip:
    @pytest.mark.parametrize(
        "cls,args", [(JointAutoregressiveHierarchicalPriors, (16, 24)), (Cheng2020Anchor, (16,))]
    )
    def test_ar_roundtrip(self, image, cls, args):
        """AR decode must reproduce the encoder's y_hat exactly, hence the
        same reconstruction."""
        m = _make(cls, *args)
        m.update(force=True)
        c = m.compress(image)
        d = m.decompress(c["strings"], c["shape"])
        assert d["x_hat"].shape == SHAPE
        # re-compress the SAME image: identical strings (determinism)
        c2 = m.compress(image)
        assert c["strings"][0] == c2["strings"][0]
        assert c["strings"][1] == c2["strings"][1]
        # decode twice: identical output
        d2 = m.decompress(c["strings"], c["shape"])
        np.testing.assert_array_equal(np.asarray(d["x_hat"]), np.asarray(d2["x_hat"]))


class TestARHalfPrecision:
    def test_joint_ar_half_roundtrip_consistent(self, image):
        """half() must not desync the AR stream: the coding-path weights stay
        fp32 (``_half_keep_fp32``) so the device wavefront encoder and the
        host "rans" decoder derive bit-identical means/scales. The "rans"
        reconstruction must equal the "tpu"-format one exactly (both decode
        the same device-derived symbols), and stay close to fp32."""
        m = _make(JointAutoregressiveHierarchicalPriors, 16, 24)
        m.update(force=True)
        ref = np.asarray(m.decompress(**_kw(m.compress(image)))["x_hat"])
        m.half()
        # AR coding-path weights pinned fp32; transforms are bf16
        assert m.params["context_prediction"]["kernel"].dtype == jnp.float32
        assert m.params["entropy_parameters"]["0"]["kernel"].dtype == jnp.float32
        assert m.params["g_a"]["0"]["kernel"].dtype == jnp.bfloat16
        c = m.decompress(**_kw(m.compress(image)))
        m.stream_format = "tpu"
        t = m.decompress(**_kw(m.compress(image)))
        np.testing.assert_allclose(
            np.asarray(c["x_hat"]), np.asarray(t["x_hat"]), atol=1e-5
        )
        assert np.max(np.abs(np.asarray(c["x_hat"]) - ref)) < 5e-2


class TestARTpuFormat:
    def test_joint_ar_tpu_format_matches_rans(self, image):
        """The lane-parallel wavefront codec must reconstruct identically to
        the reference-format serial decoder."""
        m = _make(JointAutoregressiveHierarchicalPriors, 16, 24)
        m.update(force=True)
        ref = m.decompress(**_kw(m.compress(image)))
        m.stream_format = "tpu"
        c = m.compress(image)
        d = m.decompress(c["strings"], c["shape"])
        np.testing.assert_allclose(
            np.asarray(d["x_hat"]), np.asarray(ref["x_hat"]), atol=1e-5
        )


class TestCompressAsync:
    """Two-phase compress must produce byte-identical output to the
    blocking path for the 'tpu' stream format."""

    @pytest.mark.parametrize("cls,dims", [
        ("FactorizedPrior", (16, 24)),
        ("ScaleHyperprior", (16, 24)),
        ("MeanScaleHyperprior", (16, 24)),
    ])
    def test_async_matches_blocking(self, cls, dims):
        import compressai_environment_tpu.models as M

        model = getattr(M, cls)(*dims).init(
            key=jax.random.key(3), input_shape=(1, 128, 128, 3)
        )
        model.update(force=True)
        model.stream_format = "tpu"
        x = np.clip(
            np.kron(
                np.random.default_rng(5).random((2, 16, 16, 3), np.float32),
                np.ones((1, 8, 8, 1), np.float32),
            ), 0, 1,
        )
        blocking = model.compress(x)
        handle = model.compress_async(x)
        out = handle.result()
        assert out["shape"] == blocking["shape"]
        assert out["strings"] == blocking["strings"]
