"""ScaleSpaceFlow video codec tests: forward likelihood tree, gaussian
volume/warp semantics vs torch grid_sample, codec round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressai_environment_tpu.models.video import ScaleSpaceFlow
from compressai_environment_tpu.models.video.ssf import (
    gaussian_volume,
    grid_sample_3d,
    warp_volume,
)

SHAPE = (1, 128, 128, 3)


@pytest.fixture(scope="module")
def ssf():
    return ScaleSpaceFlow().init(key=jax.random.key(0), input_shape=SHAPE)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(11)
    base = rng.random(SHAPE, dtype=np.float32)
    return [
        np.clip(base + 0.01 * i + 0.02 * rng.random(SHAPE, dtype=np.float32), 0, 1)
        for i in range(3)
    ]


class TestWarp:
    def test_grid_sample_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        b, d, h, w, c = 1, 4, 8, 8, 3
        vol = rng.standard_normal((b, d, h, w, c)).astype(np.float32)
        grid = (rng.random((b, h, w, 3)).astype(np.float32) - 0.5) * 2.2  # incl. OOB

        ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid)))

        tvol = torch.from_numpy(vol.transpose(0, 4, 1, 2, 3))  # B C D H W
        tgrid = torch.from_numpy(grid[:, None])  # B 1 H W 3
        with torch.no_grad():
            out = torch.nn.functional.grid_sample(
                tvol, tgrid, padding_mode="border", align_corners=False
            ).numpy()  # B C 1 H W
        np.testing.assert_allclose(
            ours, out[:, :, 0].transpose(0, 2, 3, 1), atol=1e-5
        )

    def test_gaussian_volume_shape(self, rng):
        x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        vol = gaussian_volume(x, 1.5, 5)
        assert vol.shape == (1, 6, 32, 32, 3)
        # level 0 is the identity
        np.testing.assert_array_equal(np.asarray(vol[:, 0]), np.asarray(x))

    def test_zero_flow_zero_scale_is_near_identity(self, rng):
        x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        vol = gaussian_volume(x, 1.5, 3)
        flow = jnp.zeros((1, 16, 16, 2))
        # z = -1 maps to depth coordinate -0.5 -> clamped level 0 (identity)
        scale = -jnp.ones((1, 16, 16, 1))
        out = warp_volume(vol, flow, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


class TestSSF:
    def test_forward_tree(self, ssf, frames):
        out = ssf.forward(frames, training=True, key=jax.random.key(1))
        assert len(out["x_hat"]) == 3
        assert set(out["likelihoods"][0]) == {"keyframe"}
        assert set(out["likelihoods"][1]) == {"motion", "residual"}
        for lik in (
            out["likelihoods"][0]["keyframe"],
            out["likelihoods"][1]["motion"],
        ):
            assert set(lik) == {"y", "z"}

    def test_aux_loss_list(self, ssf):
        aux = ssf.aux_loss()
        assert isinstance(aux, list) and len(aux) == 3
        assert all(float(a) >= 0 for a in aux)

    def test_codec_roundtrip(self, ssf, frames):
        ssf.update(force=True)
        strings, shapes = ssf.compress(frames)
        assert len(strings) == 3
        assert set(strings[1]) == {"motion", "residual"}
        dec = ssf.decompress(strings, shapes)
        assert len(dec) == 3
        for f in dec:
            assert f.shape == SHAPE
        # decode determinism
        dec2 = ssf.decompress(strings, shapes)
        for a, b in zip(dec, dec2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fused_gop_codec_matches_split(self, ssf, frames):
        """The single-dispatch fused GOP codec ("tpu" format: keyframe +
        lax.scan over inter frames with the entropy cores inlined) must
        produce byte-identical streams and identical reconstructions to
        the split per-op path it replaces."""
        ssf.update(force=True)
        old_fmt = ssf.stream_format
        ssf.stream_format = "tpu"
        try:
            assert ssf._fused_ready(frames)
            s_f, sh_f = ssf.compress(frames)
            orig = ssf._fused_ready
            ssf._fused_ready = lambda fr: False
            try:
                s_s, sh_s = ssf.compress(frames)
            finally:
                ssf._fused_ready = orig
            assert s_f[0][0] == s_s[0][0] and s_f[0][1] == s_s[0][1]
            for i in (1, 2):
                for k in ("motion", "residual"):
                    assert s_f[i][k][0] == s_s[i][k][0]
                    assert s_f[i][k][1] == s_s[i][k][1]
            assert sh_f == sh_s

            assert ssf._fused_ready_dec(s_f, sh_f)
            dec_fused = ssf.decompress(s_f, sh_f)
            orig_dec = ssf._fused_ready_dec
            ssf._fused_ready_dec = lambda *a: False
            try:
                dec_split = ssf.decompress(s_f, sh_f)
            finally:
                ssf._fused_ready_dec = orig_dec
            for a, b in zip(dec_fused, dec_split):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        finally:
            ssf.stream_format = old_fmt


class TestHalfMode:
    def test_half_gop_roundtrip_consistent(self, frames):
        """ssf2020 in bf16 half mode: encoder/decoder stay self-consistent
        (same device math both sides) and the fp32-pinned scale-space warp
        (reference AMP cast exclusion, models/video/google.py:357) keeps
        the prediction usable. Streams differ from fp32 (bf16 transforms
        shift latents) but must round-trip exactly."""
        m = ScaleSpaceFlow().init(key=jax.random.key(0), input_shape=SHAPE)
        m.update(force=True)
        m.half()
        m.stream_format = "tpu"
        s, sh = m.compress(frames)
        dec = m.decompress(s, sh)
        assert len(dec) == 3
        # re-encoding the SAME frames must reproduce identical streams
        # (deterministic device codec in half mode)
        s2, _ = m.compress(frames)

        def flat(o, acc):
            if isinstance(o, dict):
                [flat(o[k], acc) for k in sorted(o)]
            elif isinstance(o, (list, tuple)):
                [flat(v, acc) for v in o]
            else:
                acc.append(bytes(o))
        a, b = [], []
        flat(s, a), flat(s2, b)
        assert a == b
        for r in dec:
            arr = np.asarray(r, np.float32)
            assert np.isfinite(arr).all()

    def test_forward_prediction_fp32_pin_is_noop_for_fp32(self, ssf, frames):
        """The warp's fp32 pinning must be bit-exact for fp32 callers —
        "rans" reference parity depends on it."""
        x_ref = jnp.asarray(frames[0])
        rng = np.random.default_rng(5)
        mi = jnp.asarray(rng.standard_normal(
            (1, 128, 128, 3)).astype(np.float32) * 0.1)
        out = ssf.net.apply(
            {"params": ssf.params}, x_ref, mi,
            method=type(ssf.net).predict,
        )
        assert np.asarray(out).dtype == np.float32
        assert np.isfinite(np.asarray(out)).all()
