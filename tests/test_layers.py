"""Layer tests: torch numerical parity for conv/deconv/GDN geometry, mask
patterns for the causal conv, gradient contracts for bound/STE/QReLU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressai_environment_tpu.layers import (
    GDN,
    AttentionBlock,
    Conv,
    Deconv,
    MaskedConv,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    causal_mask,
    pixel_shuffle,
)
from compressai_environment_tpu.ops import lower_bound, quantize, ste_round
from compressai_environment_tpu.layers.qrelu import qrelu

torch = pytest.importorskip("torch")


def _to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _to_nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


class TestConvTorchParity:
    @pytest.mark.parametrize("k,s,hw", [(5, 2, 16), (3, 1, 13), (5, 2, 17), (1, 1, 8)])
    def test_conv_matches_torch(self, rng, k, s, hw):
        cin, cout = 4, 6
        x = rng.standard_normal((2, hw, hw, cin)).astype(np.float32)
        tconv = torch.nn.Conv2d(cin, cout, k, stride=s, padding=k // 2)
        w = tconv.weight.detach().numpy()  # (out, in, kh, kw)
        b = tconv.bias.detach().numpy()

        params = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                  "bias": jnp.asarray(b)}
        y = Conv(cout, k, s).apply({"params": params}, jnp.asarray(x))

        with torch.no_grad():
            yt = tconv(torch.from_numpy(_to_nchw(x))).numpy()
        np.testing.assert_allclose(np.asarray(y), _to_nhwc(yt), atol=1e-4)

    @pytest.mark.parametrize("k,s,hw", [(5, 2, 8), (5, 2, 9), (3, 2, 8), (3, 1, 7)])
    def test_deconv_matches_torch(self, rng, k, s, hw):
        cin, cout = 4, 6
        x = rng.standard_normal((2, hw, hw, cin)).astype(np.float32)
        tconv = torch.nn.ConvTranspose2d(
            cin, cout, k, stride=s, padding=k // 2, output_padding=s - 1
        )
        w = tconv.weight.detach().numpy()  # (in, out, kh, kw)
        b = tconv.bias.detach().numpy()

        # flip spatial dims, move to HWIO — the layout Deconv stores natively
        kt = np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))
        params = {"kernel_t": jnp.asarray(np.ascontiguousarray(kt)),
                  "bias": jnp.asarray(b)}
        y = Deconv(cout, k, s).apply({"params": params}, jnp.asarray(x))

        with torch.no_grad():
            yt = tconv(torch.from_numpy(_to_nchw(x))).numpy()
        assert y.shape == _to_nhwc(yt).shape
        np.testing.assert_allclose(np.asarray(y), _to_nhwc(yt), atol=1e-4)

    def test_pixel_shuffle_matches_torch(self, rng):
        x = rng.standard_normal((2, 5, 7, 3 * 4)).astype(np.float32)
        y = pixel_shuffle(jnp.asarray(x), 2)
        with torch.no_grad():
            yt = torch.nn.functional.pixel_shuffle(
                torch.from_numpy(_to_nchw(x)), 2
            ).numpy()
        np.testing.assert_allclose(np.asarray(y), _to_nhwc(yt), atol=1e-6)


class TestGDN:
    def test_gdn_matches_definition(self, rng):
        c = 8
        x = jnp.asarray(rng.standard_normal((2, 4, 4, c)).astype(np.float32))
        mod = GDN()
        params = mod.init(jax.random.key(0), x)["params"]
        y = mod.apply({"params": params}, x)
        # with default init: beta=1, gamma=0.1*I -> y = x / sqrt(1 + 0.1 x^2)
        expected = np.asarray(x) / np.sqrt(1.0 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)

    def test_igdn_inverts(self, rng):
        c = 8
        x = jnp.asarray(rng.standard_normal((2, 4, 4, c)).astype(np.float32))
        mod = GDN(inverse=True)
        params = mod.init(jax.random.key(0), x)["params"]
        y = mod.apply({"params": params}, x)
        expected = np.asarray(x) * np.sqrt(1.0 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)


class TestMaskedConv:
    def test_mask_pattern_a(self):
        m = causal_mask(5, 5, "A")
        assert m[2, 2] == 0  # center masked
        assert m[2, :2].all() and m[:2].all()
        assert not m[2, 2:].any() and not m[3:].any()

    def test_mask_pattern_b(self):
        m = causal_mask(5, 5, "B")
        assert m[2, 2] == 1  # center kept
        assert not m[2, 3:].any() and not m[3:].any()

    def test_mask_1d_kernels(self):
        # reference tests/test_layers.py also covers (1, k) and (k, 1)
        ma = causal_mask(1, 3, "A")
        assert ma.tolist() == [[1, 0, 0]]
        mb = causal_mask(1, 3, "B")
        assert mb.tolist() == [[1, 1, 0]]

    def test_causality(self, rng):
        """Output at (h, w) must not depend on inputs at or after (h, w)."""
        mod = MaskedConv(4, kernel_size=5, mask_type="A")
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
        params = mod.init(jax.random.key(0), x)["params"]
        y0 = mod.apply({"params": params}, x)
        x2 = x.at[0, 4, 4, :].add(100.0)  # perturb "current" pixel
        y1 = mod.apply({"params": params}, x2)
        assert jnp.allclose(y0[0, 4, 4], y1[0, 4, 4])  # center not visible
        assert jnp.allclose(y0[0, :4], y1[0, :4])  # earlier rows unaffected
        assert not jnp.allclose(y0[0, 5], y1[0, 5])  # later rows see it


class TestBlocks:
    @pytest.mark.parametrize(
        "block,out_shape",
        [
            (lambda: ResidualBlock(8), (1, 8, 8, 8)),
            (lambda: ResidualBlockWithStride(8, 2), (1, 4, 4, 8)),
            (lambda: ResidualBlockUpsample(8, 2), (1, 16, 16, 8)),
            (lambda: AttentionBlock(6), (1, 8, 8, 6)),
        ],
    )
    def test_shapes(self, rng, block, out_shape):
        mod = block()
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 6)).astype(np.float32))
        params = mod.init(jax.random.key(0), x)["params"]
        y = mod.apply({"params": params}, x)
        assert y.shape == out_shape


class TestOps:
    def test_ste_round_identity_gradient(self):
        g = jax.grad(lambda x: jnp.sum(ste_round(x) * 3.0))(jnp.array([0.3, 1.7]))
        np.testing.assert_allclose(np.asarray(g), [3.0, 3.0])

    def test_lower_bound_gradient_gating(self):
        # reference tests/test_ops.py: grad passes iff x >= bound or g < 0
        x = jnp.array([0.5, 2.0])
        bound = jnp.array(1.0)

        # upward-pushing gradient (g < 0 in dL/dx sense is handled inside)
        def f(x):
            return jnp.sum(lower_bound(x, bound))

        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), [0.0, 1.0])

        def f2(x):
            return -jnp.sum(lower_bound(x, bound))

        g2 = jax.grad(f2)(x)  # incoming grad -1 < 0 -> passes everywhere
        np.testing.assert_allclose(np.asarray(g2), [-1.0, -1.0])

    def test_quantize_modes(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 3, 4, 4)).astype(np.float32)) * 5
        means = jnp.ones_like(x) * 0.25
        noisy = quantize(x, "noise", key=jax.random.key(0))
        assert jnp.max(jnp.abs(noisy - x)) <= 0.5
        deq = quantize(x, "dequantize", means)
        np.testing.assert_allclose(
            np.asarray(deq), np.round(np.asarray(x - means)) + np.asarray(means)
        )
        sym = quantize(x, "symbols", means)
        assert sym.dtype == jnp.int32
        np.testing.assert_array_equal(
            np.asarray(sym), np.round(np.asarray(x - means)).astype(np.int32)
        )

    def test_qrelu_forward_and_grad(self):
        x = jnp.array([-1.0, 100.0, 300.0])
        y = qrelu(x, 8, 100.0)
        np.testing.assert_allclose(np.asarray(y), [0.0, 100.0, 255.0])
        g = jax.grad(lambda x: jnp.sum(qrelu(x, 8, 100.0)))(x)
        assert g[1] == 1.0  # in-range: identity
        assert 0.0 <= g[0] < 1.0 and 0.0 <= g[2] < 1.0  # surrogate outside


class TestFoldedDeconv:
    def test_fold_matches_direct_deconv_f32(self, rng):
        """fold_deconv_kernel_5s2 + pixel_shuffle must equal the direct
        lhs-dilated deconv (validated in f32; the module uses the folded
        form only for bf16 tiny-output deconvs)."""
        import jax.numpy as jnp
        from jax import lax

        from compressai_environment_tpu.layers.conv import (
            fold_deconv_kernel_5s2,
            pixel_shuffle,
        )

        kt = jnp.asarray(rng.standard_normal((5, 5, 16, 3)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 12, 10, 16)), jnp.float32)
        dn = ("NHWC", "HWIO", "NHWC")
        direct = lax.conv_general_dilated(
            x, kt, (1, 1), [(2, 3), (2, 3)], lhs_dilation=(2, 2),
            dimension_numbers=dn, precision=lax.Precision.HIGHEST,
        )
        kf = fold_deconv_kernel_5s2(kt)
        folded = pixel_shuffle(
            lax.conv_general_dilated(
                x, kf, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                precision=lax.Precision.HIGHEST,
            ),
            2,
        )
        assert folded.shape == direct.shape == (2, 24, 20, 3)
        np.testing.assert_allclose(
            np.asarray(folded), np.asarray(direct), atol=1e-4
        )

    def test_deconv_module_bf16_uses_folded_path(self, rng):
        import jax
        import jax.numpy as jnp

        from compressai_environment_tpu.layers import Deconv

        d = Deconv(3, 5, 2)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
        p = d.init(jax.random.key(0), x)
        y32 = d.apply(p, x)
        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
        y16 = d.apply(p16, x.astype(jnp.bfloat16))
        assert y16.shape == y32.shape
        np.testing.assert_allclose(
            np.asarray(y16, np.float32), np.asarray(y32), atol=0.15, rtol=0.1
        )
