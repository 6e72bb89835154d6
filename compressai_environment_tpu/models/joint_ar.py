"""JointAutoregressiveHierarchicalPriors (mbt2018) and helpers
(reference ``models/google.py:395-661``).

Training forward is fully jitted (masked conv over the whole tensor).
The codec path is two-stage:

* hyper params are computed densely on device,
* the serial AR raster scan runs as a vectorized numpy kernel on host
  (weights pulled once; per-pixel 5x5-context GEMM + entropy-parameter MLP),
  feeding the incremental C++ rANS coder. This is the strict-raster mode that
  reproduces the reference bitstream order exactly; the blocked-wavefront
  on-device scheduler (see ``parallel/wavefront.py``) accelerates the same
  math under the skewed schedule t = 3h + w.

Symbol order within the stream: raster (h, w), M channels per pixel —
identical to the reference (``models/google.py:535-577``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import coder
from ..entropy_models import EntropyBottleneck, GaussianConditional
from ..entropy_models import bottleneck as eb_ops
from ..entropy_models import gaussian as gc_ops
from ..entropy_models.gaussian import get_scale_table
from ..layers import MaskedConv, causal_mask
from .google import ScaleHyperprior
from .transforms import (
    AnalysisTransform,
    EntropyParameters,
    HyperAnalysisJoint,
    HyperSynthesisJoint,
    SynthesisTransform,
)

__all__ = ["JointAutoregressiveHierarchicalPriors"]


class JointARNet(nn.Module):
    N: int
    M: int

    def setup(self):
        self.g_a = AnalysisTransform(self.N, self.M, kernel_size=5)
        self.g_s = SynthesisTransform(self.N, kernel_size=5)
        self.h_a = HyperAnalysisJoint(self.N)
        self.h_s = HyperSynthesisJoint(self.N, self.M)
        self.entropy_parameters = EntropyParameters(self.M)
        self.context_prediction = MaskedConv(2 * self.M, kernel_size=5, mask_type="A")
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian_conditional = GaussianConditional()

    def __call__(self, x, training: bool = True):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training)
        params = self.h_s(z_hat)

        if training:
            y_hat = y + jax.random.uniform(
                self.make_rng("noise"), y.shape, y.dtype, -0.5, 0.5
            )
        else:
            y_hat = jnp.round(y)
        ctx_params = self.context_prediction(y_hat)
        gaussian_params = self.entropy_parameters(
            jnp.concatenate((params, ctx_params), axis=-1)
        )
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        _, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means_hat, training
        )
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def encode(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        return y, z

    def hyper_decode(self, z_hat):
        return self.h_s(z_hat)

    def decode(self, y_hat):
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)

    def eb_medians(self):
        return self.entropy_bottleneck.medians()

    def eb_aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class _ARWeights:
    """Host-side copies of the AR-path weights, pulled once per model."""

    def __init__(self, params, M: int):
        cp = params["context_prediction"]
        mask = causal_mask(5, 5, "A")[:, :, None, None]
        self.ctx_kernel = (np.asarray(cp["kernel"]) * mask).reshape(-1, 2 * M)
        self.ctx_bias = np.asarray(cp["bias"])
        ep = params["entropy_parameters"]
        self.ep = [
            (np.asarray(ep[n]["kernel"]).reshape(
                np.asarray(ep[n]["kernel"]).shape[2], -1
            ), np.asarray(ep[n]["bias"]))
            for n in ("0", "2", "4")
        ]

    def entropy_parameters(self, v: np.ndarray) -> np.ndarray:
        """v: (B, C_in) -> (B, 2M); 1x1 convs = matmuls + leaky ReLU."""
        for i, (w, b) in enumerate(self.ep):
            v = v @ w + b
            if i < len(self.ep) - 1:
                v = np.where(v > 0, v, 0.01 * v)
        return v


class JointAutoregressiveHierarchicalPriors(ScaleHyperprior):
    net_cls = JointARNet
    uses_means = True
    # half(): keep the AR coding-path weights fp32 so the device wavefront
    # encoder and the host "rans" decoder compute bit-identical means/scales
    # (host/device GEMM equality is only established for fp32).
    _half_keep_fp32 = ("context_prediction", "entropy_parameters")

    def __init__(self, N=192, M=192, params=None):
        super().__init__(N, M, params)

    @property
    def downsampling_factor(self) -> int:
        return 2 ** (4 + 2)

    # ------------------------------------------------------------------
    def _ar_weights(self) -> _ARWeights:
        if "ar_weights" not in self._jit_cache:
            self._jit_cache["ar_weights"] = _ARWeights(self.params, self.M)
        return self._jit_cache["ar_weights"]

    def _ar_weights_device(self):
        if "ar_weights_dev" not in self._jit_cache:
            from ..parallel.wavefront import ARWeightsDevice

            self._jit_cache["ar_weights_dev"] = ARWeightsDevice(self.params, self.M)
        return self._jit_cache["ar_weights_dev"]

    def compress(self, x):
        self._require_tables("y", "z")
        x = self._nhwc(x)
        encode = self._jitted(
            "encode", lambda p, v: self.net.apply(p, v, method=self.net_cls.encode)
        )
        y, z = encode({"params": self.params}, x)

        # dispatch z coding without blocking ("tpu" path): the stream fetch
        # overlaps the hyper-synthesis + wavefront work below
        if self.stream_format == "tpu":
            z_handle = eb_ops.compress_async(z, self._medians(), self.tables["z"])
            z_strings = None
        else:
            z_strings = eb_ops.compress(
                z, self._medians(), self.tables["z"], fmt=self.stream_format
            )
        z_hat = self._z_hat_on_device(z)
        hyper = self._jitted(
            "hyper_decode",
            lambda p, v: self.net.apply(p, v, method=self.net_cls.hyper_decode),
        )
        # fp32 for the AR coding path even under half(): the bf16 h_s values
        # upcast exactly, and all downstream GEMMs then match the fp32 host
        # decoder bit-for-bit.
        params_hs = hyper({"params": self.params}, jnp.asarray(z_hat)).astype(
            jnp.float32
        )
        y = y.astype(jnp.float32)

        # AR symbols via the device wavefront scheduler (symbol-exact with the
        # serial raster scan), batched over images — all images advance the
        # same anti-diagonal step together in one program. Stream format:
        #   "rans": single raster-order stream per image (reference layout)
        #   "tpu":  one rANS lane per channel (wavefront pop order) so decode
        #           follows the same wavefront on device with M lanes of
        #           container overhead instead of H*M. y/params stay
        #           device-resident.
        from ..parallel.wavefront import (
            encode_ar_chan_device_batch,
            wavefront_encode_symbols_batch,
        )

        tables = self.tables["y"]
        if self.stream_format == "tpu":
            # device wavefront encode; the decoder is the device wavefront
            # too, so both sides' scales come from the same XLA subgraph
            # (plus the clamp-snap below, shared by both programs)
            w8 = self._ar_weights_device()
            symbols, indexes, _ = wavefront_encode_symbols_batch(
                y, params_hs, w8, self.scale_table
            )
            y_strings = encode_ar_chan_device_batch(symbols, indexes, tables)
            z_strings = z_handle.result()
        else:
            # host serial raster — the SAME numpy code as _decompress_ar, so
            # the decoder's recomputed scales/means are bit-identical by
            # construction. The wavefront derivation (XLA GEMMs) can differ
            # from the host decoder by 1 ULP, and the reference's
            # scale-table clamp parks the entire clamped mass exactly ON
            # the idx 0/1 searchsorted boundary: a trained checkpoint with
            # many scales < 0.11 then desyncs the stream (measured: serial
            # 0.109999985 -> idx 0 vs wavefront 0.11000001 -> idx 1).
            ph = np.asarray(params_hs, np.float32)
            y_np = np.asarray(y, np.float32)
            pad = 2
            y_strings = [
                self._compress_ar(
                    y_np[b], ph[b], y_np.shape[1], y_np.shape[2], pad
                )
                for b in range(y_np.shape[0])
            ]
        return {"strings": [y_strings, z_strings], "shape": tuple(z.shape[1:3])}

    def _compress_ar(self, y, params_hs, height, width, pad) -> bytes:
        """Strict-raster AR encode of one image's latents (host serial
        fallback; kept as the executable specification of the coding order —
        the wavefront path is tested symbol-exact against it)."""
        w8 = self._ar_weights()
        M = self.M
        tables = self.tables["y"]
        scale_table = self.scale_table

        y_hat = np.zeros((height + 2 * pad, width + 2 * pad, M), np.float32)
        y_hat[pad : pad + height, pad : pad + width] = y

        symbols = np.empty((height, width, M), np.int32)
        indexes = np.empty((height, width, M), np.int32)

        for h in range(height):
            for w in range(width):
                crop = y_hat[h : h + 5, w : w + 5, :]
                ctx_p = crop.reshape(1, -1) @ w8.ctx_kernel + w8.ctx_bias
                p = params_hs[h, w][None, :]
                gp = w8.entropy_parameters(
                    np.concatenate((p, ctx_p), axis=1)
                )[0]
                scales_hat, means_hat = gp[:M], gp[M:]
                idx = np.searchsorted(
                    scale_table[:-1], np.maximum(scales_hat, 0.11), side="left"
                )
                y_q = np.round(y[h, w] - means_hat).astype(np.int32)
                y_hat[h + pad, w + pad] = y_q + means_hat
                symbols[h, w] = y_q
                indexes[h, w] = idx

        return coder.encode_with_indexes(
            symbols, indexes, tables.quantized_cdf, tables.cdf_length,
            tables.offset, backend=self.stream_format,
        )

    def decompress(self, strings, shape):
        assert isinstance(strings, list) and len(strings) == 2
        self._require_tables("y", "z")
        z_hat = eb_ops.decompress(
            strings[1], tuple(shape), self._medians(), self.tables["z"],
            fmt=self.stream_format,
        )
        hyper = self._jitted(
            "hyper_decode",
            lambda p, v: self.net.apply(p, v, method=self.net_cls.hyper_decode),
        )
        # fp32 like the compress side; stays device-resident for the device
        # wavefront (the host raster decoder materializes it to numpy).
        params_hs = hyper({"params": self.params}, jnp.asarray(z_hat)).astype(
            jnp.float32
        )

        s, pad = 4, 2
        y_h, y_w = shape[0] * s, shape[1] * s

        if self.stream_format == "tpu":
            from ..parallel.wavefront import wavefront_decode_batch

            w8 = self._ar_weights_device()
            y_hat = wavefront_decode_batch(
                strings[0], params_hs, w8, self.tables["y"],
                self.scale_table, y_h, y_w,
            )
        else:
            params_hs = np.asarray(params_hs, np.float32)
            y_hat = np.zeros((len(strings[0]), y_h, y_w, self.M), np.float32)
            for b, y_string in enumerate(strings[0]):
                y_hat[b] = self._decompress_ar(y_string, params_hs[b], y_h, y_w, pad)

        decode = self._jitted(
            "decode", lambda p, v: self.net.apply(p, v, method=self.net_cls.decode)
        )
        x_hat = decode({"params": self.params}, jnp.asarray(y_hat))
        return {"x_hat": x_hat.astype(jnp.float32)}

    def _decompress_ar(self, y_string, params_hs, height, width, pad) -> np.ndarray:
        w8 = self._ar_weights()
        M = self.M
        tables = self.tables["y"]
        scale_table = self.scale_table

        dec = coder.StreamDecoder(y_string, backend=self.stream_format)
        y_hat = np.zeros((height + 2 * pad, width + 2 * pad, M), np.float32)

        for h in range(height):
            for w in range(width):
                crop = y_hat[h : h + 5, w : w + 5, :]
                ctx_p = crop.reshape(1, -1) @ w8.ctx_kernel + w8.ctx_bias
                p = params_hs[h, w][None, :]
                gp = w8.entropy_parameters(
                    np.concatenate((p, ctx_p), axis=1)
                )[0]
                scales_hat, means_hat = gp[:M], gp[M:]
                idx = np.searchsorted(
                    scale_table[:-1], np.maximum(scales_hat, 0.11), side="left"
                ).astype(np.int32)
                rv = dec.decode_stream(
                    idx, tables.quantized_cdf, tables.cdf_length, tables.offset
                )
                y_hat[h + pad, w + pad] = rv.astype(np.float32) + means_hat

        return y_hat[pad : pad + height, pad : pad + width]
