"""Google-family image codecs: bmshj2018 factorized/hyperprior and
mbt2018-mean (reference ``models/google.py``), TPU-native.

Each codec = a flax net (pure, jittable: training forward + transform
methods) + a wrapper class with the reference's stateful surface. Device work
(transforms, index building) is jitted per shape; symbol coding runs through
the batched C++ rANS host coder.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy_models import EntropyBottleneck, GaussianConditional
from ..entropy_models import bottleneck as eb_ops
from ..entropy_models import gaussian as gc_ops
from ..entropy_models.gaussian import build_indexes, get_scale_table
from .base import CompressionModel
from .transforms import (
    AnalysisTransform,
    HyperAnalysisAbs,
    HyperAnalysisMS,
    HyperSynthesisMS,
    HyperSynthesisScale,
    SynthesisTransform,
)

__all__ = [
    "FactorizedPrior",
    "ScaleHyperprior",
    "MeanScaleHyperprior",
    "get_scale_table",
]


# ---------------------------------------------------------------------------
# FactorizedPrior (bmshj2018-factorized) — reference models/google.py:119-191
# ---------------------------------------------------------------------------


class FactorizedPriorNet(nn.Module):
    N: int
    M: int

    def setup(self):
        self.g_a = AnalysisTransform(self.N, self.M)
        self.g_s = SynthesisTransform(self.N)
        self.entropy_bottleneck = EntropyBottleneck(self.M)

    def __call__(self, x, training: bool = True):
        y = self.g_a(x)
        y_hat, y_likelihoods = self.entropy_bottleneck(y, training)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods}}

    def encode(self, x):
        return self.g_a(x)

    def decode(self, y_hat):
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)

    def analysis(self, x):
        return self.g_a(x)

    def synthesis(self, y_hat):
        return self.g_s(y_hat)

    def eb_medians(self):
        return self.entropy_bottleneck.medians()

    def eb_aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class FactorizedPrior(CompressionModel):
    def __init__(self, N, M, params=None):
        super().__init__(FactorizedPriorNet(N, M), params)
        self.N, self.M = int(N), int(M)

    @property
    def downsampling_factor(self) -> int:
        return 2**4

    def aux_loss(self):
        return self._apply(FactorizedPriorNet.eb_aux_loss)

    def update(self, force: bool = False) -> bool:
        if "y" in self.tables and not force:
            return False
        self.tables["y"] = eb_ops.build_tables(
            EntropyBottleneck(self.M), self.params["entropy_bottleneck"]
        )
        return True

    def _medians(self) -> np.ndarray:
        return np.asarray(
            self.params["entropy_bottleneck"]["quantiles"], np.float32
        )[:, 0, 1]

    def compress(self, x):
        self._require_tables("y")
        x = self._nhwc(x)
        encode = self._jitted(
            "encode", lambda p, v: self.net.apply(p, v, method=FactorizedPriorNet.encode)
        )
        y = encode({"params": self.params}, x)
        y_strings = eb_ops.compress(
            y, self._medians(), self.tables["y"], fmt=self.stream_format
        )
        return {"strings": [y_strings], "shape": tuple(y.shape[1:3])}

    def compress_async(self, x):
        """Two-phase compress ("tpu" stream format only): dispatches the
        analysis transform + on-device entropy coding without blocking and
        returns a handle whose ``result()`` yields the ``compress`` dict.
        Interleaving handles across sub-batches overlaps D2H stream
        downloads with the next sub-batch's compute.

        With compact (one-hot) tables the WHOLE encode — input scaling, g_a,
        quantization and the entropy-coding core — is ONE fused jit
        dispatch: each separate dispatch costs a full RPC round trip on the
        dev tunnel (~25 ms measured, tools/encode_phase_exp.py), and the
        fusion also lets XLA skip the HBM-materialized (B, n) one-hot select
        intermediates between passes."""
        if self.stream_format != "tpu":
            out = self.compress(x)
            return type("_Done", (), {"result": staticmethod(lambda: out)})()
        self._require_tables("y")
        tables = self.tables["y"]
        ct = tables.device_compact
        if ct is None:
            x = self._nhwc(x)
            encode = self._jitted(
                "encode",
                lambda p, v: self.net.apply(p, v, method=FactorizedPriorNet.encode),
            )
            y = encode({"params": self.params}, x)
            handle = eb_ops.compress_async(y, self._medians(), tables)
            shape = tuple(y.shape[1:3])

            class _Handle:
                @staticmethod
                def result():
                    return {"strings": [handle.result()], "shape": shape}

            return _Handle()

        from ..entropy import vrans

        x_dev = jnp.asarray(x)
        if x_dev.ndim != 4:
            raise ValueError("expected (B, H, W, C) input")
        is_u8 = x_dev.dtype == jnp.uint8
        B, H, W = x_dev.shape[0], x_dev.shape[1], x_dev.shape[2]
        hy, wy = H // 16, W // 16
        hw = hy * wy
        n = hw * self.M
        med = np.asarray(self._medians())
        cdt = self._compute_dtype
        net, M = self.net, self.M

        rt = tables.device_rowseq
        rl = vrans.rowseq_lanes(n, hw)
        if rt is not None and rl is not None:
            # row-sequential planar grid: zero select work in the scan
            lanes, T = rl, n // rl
            w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)
            rows_t = vrans.rowseq_schedule(M, hw, lanes)
            med_rep = np.repeat(med.astype(np.float32), hw)

            def fused(p, v, start_t, freq_t, off_t, maxv_t, k_t):
                vv = (
                    v.astype(cdt) / np.asarray(255.0, cdt) if is_u8
                    else v.astype(cdt)
                )
                y = net.apply(p, vv, method=FactorizedPriorNet.encode)
                yp = y.transpose(0, 3, 1, 2).reshape(B, -1)
                sym = jnp.round(
                    yp.astype(jnp.float32) - jnp.asarray(med_rep)
                ).astype(jnp.int32)
                out = vrans._encode_device_core_rowseq(
                    sym, jnp.asarray(rows_t), start_t, freq_t,
                    off_t, maxv_t, k_t, T, lanes, w_cap,
                )
                return out + (sym,)

            key = f"enc_fused_rs_{x_dev.shape}_{x_dev.dtype}_{lanes}"
            out = self._jitted(key, fused)(
                {"params": self.params}, x_dev, rt["start"], rt["freq"],
                rt["off"], rt["maxv"], rt["k"],
            )
            handle = vrans.EncodeDeviceHandle.from_core_outputs(
                out[:-1], out[-1], None, tables, n, lanes, w_cap,
            )
            handle._flags = vrans._FLAG_STEPMAJOR
            sym_dev, rows_dev = out[-1], jnp.asarray(rows_t)
            handle._retry = lambda: (
                vrans._encode_device_core_rowseq(
                    sym_dev, rows_dev, rt["start"], rt["freq"],
                    rt["off"], rt["maxv"], rt["k"], T, lanes, T + 2,
                ),
                T + 2,
            )
        else:
            lanes = vrans.pick_lanes(n)
            T = -(-n // lanes)
            w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)

            def fused(p, v, enc_hi, enc_lo):
                vv = (
                    v.astype(cdt) / np.asarray(255.0, cdt) if is_u8
                    else v.astype(cdt)
                )
                y = net.apply(p, vv, method=FactorizedPriorNet.encode)
                sym = jnp.round(
                    y.astype(jnp.float32) - jnp.asarray(med)
                ).astype(jnp.int32).reshape(B, -1)
                idx = jnp.broadcast_to(
                    jnp.arange(M, dtype=jnp.int32), y.shape
                ).reshape(B, -1)
                out = vrans._encode_device_core_onehot(
                    sym, idx, enc_hi, enc_lo, T, lanes, w_cap
                )
                return out + (sym,)

            key = f"enc_fused_{x_dev.shape}_{x_dev.dtype}_{lanes}"
            out = self._jitted(key, fused)(
                {"params": self.params}, x_dev, ct["enc_hi"], ct["enc_lo"]
            )
            handle = vrans.EncodeDeviceHandle.from_core_outputs(
                out[:-1], out[-1],
                lambda: np.broadcast_to(
                    np.arange(M, dtype=np.int32), (B, hy, wy, M)
                ).reshape(B, -1),
                tables, n, lanes, w_cap,
            )
        shape = (hy, wy)

        class _FusedHandle:
            @staticmethod
            def result():
                return {"strings": [handle.result()], "shape": shape}

        return _FusedHandle()

    def decompress(self, strings, shape, *, sharding=None):
        assert isinstance(strings, list) and len(strings) == 1
        self._require_tables("y")
        tables = self.tables["y"]
        ct = tables.device_compact
        if self.stream_format == "tpu" and sharding is None and ct is not None:
            # fused single-dispatch decode: entropy-decode core + dequantize
            # + synthesis transform in ONE jit (see compress_async)
            from ..entropy import vrans

            B = len(strings[0])
            hy, wy = tuple(shape)
            hw = hy * wy
            n = hw * self.M
            prep = vrans.prepare_decode_blobs(strings[0], n)
            med = np.asarray(self._medians())
            cdt = self._compute_dtype
            net, M = self.net, self.M
            T, lanes = prep["T"], prep["lanes"]
            max_w, has_raw = prep["max_w"], prep["has_raw"]

            if prep["stepmajor"]:
                rt = tables.device_rowseq
                rows_t = vrans.rowseq_schedule(M, hw, lanes)
                med_rep = np.repeat(med.astype(np.float32), hw)

                def fused(p, flat, counts, raw, search, off_t, maxv_t, k_t):
                    sym = vrans._decode_device_core_rowseq(
                        flat, counts, jnp.asarray(rows_t), raw,
                        search, off_t, maxv_t, k_t,
                        T, lanes, max_w, has_raw,
                    )
                    yp = sym.astype(jnp.float32) + jnp.asarray(med_rep)
                    y_hat = yp.reshape(B, M, hy, wy).transpose(0, 2, 3, 1)
                    return net.apply(
                        p, y_hat.astype(cdt), method=FactorizedPriorNet.decode
                    )

                key = (
                    f"dec_fused_rs_{B}_{hy}x{wy}_{lanes}_{max_w}_{has_raw}_"
                    f"{prep['raw'].shape}_{prep['stream_all'].shape}"
                )
                x_hat = self._jitted(key, fused)(
                    {"params": self.params},
                    jnp.asarray(prep["stream_all"]),
                    jnp.asarray(prep["counts_all"].astype(np.int32)),
                    jnp.asarray(prep["raw"]),
                    rt["search"], rt["off"], rt["maxv"], rt["k"],
                )
                return {"x_hat": x_hat.astype(jnp.float32)}

            def fused(p, flat, counts, raw, dec_hi, dec_lo):
                idx = jnp.broadcast_to(
                    jnp.arange(M, dtype=jnp.int32), (B, hy, wy, M)
                ).reshape(B, -1)
                sym = vrans._decode_device_core_onehot(
                    flat, counts, idx, raw, dec_hi, dec_lo,
                    T, lanes, max_w, has_raw,
                )
                y_hat = (
                    sym.reshape(B, hy, wy, M).astype(jnp.float32)
                    + jnp.asarray(med)
                )
                return net.apply(
                    p, y_hat.astype(cdt), method=FactorizedPriorNet.decode
                )

            key = (
                f"dec_fused_{B}_{hy}x{wy}_{lanes}_{max_w}_{has_raw}_"
                f"{prep['raw'].shape}_{prep['stream_all'].shape}"
            )
            x_hat = self._jitted(key, fused)(
                {"params": self.params},
                jnp.asarray(prep["stream_all"]),
                jnp.asarray(prep["counts_all"].astype(np.int32)),
                jnp.asarray(prep["raw"]),
                ct["dec_hi"], ct["dec_lo"],
            )
            return {"x_hat": x_hat.astype(jnp.float32)}
        y_hat = eb_ops.decompress(
            strings[0], tuple(shape), self._medians(), self.tables["y"],
            fmt=self.stream_format, sharding=sharding,
        )
        decode = self._jitted(
            "decode", lambda p, v: self.net.apply(p, v, method=FactorizedPriorNet.decode)
        )
        x_hat = decode({"params": self.params}, self._cast(y_hat))
        return {"x_hat": x_hat.astype(jnp.float32)}


# ---------------------------------------------------------------------------
# ScaleHyperprior (bmshj2018-hyperprior) — reference models/google.py:204-321
# ---------------------------------------------------------------------------


class ScaleHyperpriorNet(nn.Module):
    N: int
    M: int

    def setup(self):
        self.g_a = AnalysisTransform(self.N, self.M)
        self.g_s = SynthesisTransform(self.N)
        self.h_a = HyperAnalysisAbs(self.N)
        self.h_s = HyperSynthesisScale(self.N, self.M)
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian_conditional = GaussianConditional()

    def __call__(self, x, training: bool = True):
        y = self.g_a(x)
        z = self.h_a(jnp.abs(y))
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training)
        scales_hat = self.h_s(z_hat)
        y_hat, y_likelihoods = self.gaussian_conditional(y, scales_hat, None, training)
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def encode(self, x):
        y = self.g_a(x)
        z = self.h_a(jnp.abs(y))
        return y, z

    def hyper_decode(self, z_hat):
        return self.h_s(z_hat)

    def decode(self, y_hat):
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)

    def analysis(self, x):
        return self.g_a(x)

    def synthesis(self, y_hat):
        return self.g_s(y_hat)

    def eb_medians(self):
        return self.entropy_bottleneck.medians()

    def eb_aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class ScaleHyperprior(CompressionModel):
    net_cls = ScaleHyperpriorNet
    uses_means = False

    def __init__(self, N, M, params=None):
        super().__init__(self.net_cls(N, M), params)
        self.N, self.M = int(N), int(M)
        self.scale_table = None

    @property
    def downsampling_factor(self) -> int:
        return 2 ** (4 + 2)

    def aux_loss(self):
        return self._apply(self.net_cls.eb_aux_loss)

    def _eb_channels(self) -> int:
        return self.N

    def _medians(self) -> np.ndarray:
        return np.asarray(
            self.params["entropy_bottleneck"]["quantiles"], np.float32
        )[:, 0, 1]

    def update(self, scale_table=None, force: bool = False) -> bool:
        updated = False
        if "y" not in self.tables or force or scale_table is not None:
            if scale_table is None:
                scale_table = get_scale_table()
            self.scale_table = np.asarray(scale_table, np.float32)
            self.tables["y"] = gc_ops.build_tables(self.scale_table)
            updated = True
        if "z" not in self.tables or force:
            self.tables["z"] = eb_ops.build_tables(
                EntropyBottleneck(self._eb_channels()),
                self.params["entropy_bottleneck"],
            )
            updated = True
        return updated

    # -- codec paths -------------------------------------------------------
    def compress(self, x):
        self._require_tables("y", "z")
        x = self._nhwc(x)
        encode = self._jitted(
            "encode", lambda p, v: self.net.apply(p, v, method=self.net_cls.encode)
        )
        y, z = encode({"params": self.params}, x)

        z_strings = eb_ops.compress(
            z, self._medians(), self.tables["z"], fmt=self.stream_format
        )
        z_hat = self._z_hat_on_device(z)

        params_dev = {"params": self.params}
        hyper = self._jitted(
            "hyper_decode",
            lambda p, v: self.net.apply(p, v, method=self.net_cls.hyper_decode),
        )
        out = hyper(params_dev, self._cast(z_hat))
        indexes, means = self._indexes_and_means(out)

        y_strings = gc_ops.compress(
            y, indexes, self.tables["y"], means, fmt=self.stream_format
        )
        return {"strings": [y_strings, z_strings], "shape": tuple(z.shape[1:3])}

    def compress_async(self, x):
        """Two-phase compress ("tpu" format): all device work (transforms,
        z/y entropy-coding scans) is dispatched without blocking; only
        ``result()`` fetches streams. Interleaving handles across sub-batches
        overlaps D2H with the next sub-batch's compute."""
        if self.stream_format != "tpu":
            out = self.compress(x)
            return type("_Done", (), {"result": staticmethod(lambda: out)})()
        self._require_tables("y", "z")
        x = self._nhwc(x)
        encode = self._jitted(
            "encode", lambda p, v: self.net.apply(p, v, method=self.net_cls.encode)
        )
        y, z = encode({"params": self.params}, x)

        z_handle = eb_ops.compress_async(z, self._medians(), self.tables["z"])
        z_hat = self._z_hat_on_device(z)
        hyper = self._jitted(
            "hyper_decode",
            lambda p, v: self.net.apply(p, v, method=self.net_cls.hyper_decode),
        )
        out = hyper({"params": self.params}, self._cast(z_hat))
        indexes, means = self._indexes_and_means(out)
        y_handle = gc_ops.compress_async(y, indexes, self.tables["y"], means)
        shape = tuple(z.shape[1:3])

        class _Handle:
            @staticmethod
            def result():
                return {
                    "strings": [y_handle.result(), z_handle.result()],
                    "shape": shape,
                }

        return _Handle()

    def _z_hat_on_device(self, z):
        """The decoder's z_hat without the bitstream round trip: coding is
        lossless, so ``decompress(compress(z)) == round(z - medians) +
        medians`` exactly (the reference re-decodes its own stream for the
        same values — models/google.py:306-309; byte-equality with it is
        pinned by the reference-parity suite)."""
        fn = self._jitted(
            "z_hat",
            lambda z, med: (
                jnp.round(z.astype(jnp.float32) - med) + med
            ),
        )
        return fn(jnp.asarray(z), jnp.asarray(self._medians()))

    def decompress(self, strings, shape, *, sharding=None):
        assert isinstance(strings, list) and len(strings) == 2
        self._require_tables("y", "z")
        z_hat = eb_ops.decompress(
            strings[1], tuple(shape), self._medians(), self.tables["z"],
            fmt=self.stream_format, sharding=sharding,
        )
        hyper = self._jitted(
            "hyper_decode",
            lambda p, v: self.net.apply(p, v, method=self.net_cls.hyper_decode),
        )
        out = hyper({"params": self.params}, self._cast(z_hat))
        indexes, means = self._indexes_and_means(out)
        y_hat = gc_ops.decompress(
            strings[0], indexes, self.tables["y"], means,
            fmt=self.stream_format, sharding=sharding,
        )
        decode = self._jitted(
            "decode", lambda p, v: self.net.apply(p, v, method=self.net_cls.decode)
        )
        x_hat = decode({"params": self.params}, self._cast(y_hat))
        return {"x_hat": x_hat.astype(jnp.float32)}

    def _indexes_and_means(self, hyper_out):
        """ScaleHyperprior: h_s output is scales only."""
        indexes = build_indexes(hyper_out, jnp.asarray(self.scale_table))
        return indexes, None


# ---------------------------------------------------------------------------
# MeanScaleHyperprior (mbt2018-mean) — reference models/google.py:324-392
# ---------------------------------------------------------------------------


class MeanScaleHyperpriorNet(ScaleHyperpriorNet):
    def setup(self):
        self.g_a = AnalysisTransform(self.N, self.M)
        self.g_s = SynthesisTransform(self.N)
        self.h_a = HyperAnalysisMS(self.N)
        self.h_s = HyperSynthesisMS(self.N, self.M)
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian_conditional = GaussianConditional()

    def __call__(self, x, training: bool = True):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training)
        gaussian_params = self.h_s(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        y_hat, y_likelihoods = self.gaussian_conditional(
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


class MeanScaleHyperprior(ScaleHyperprior):
    net_cls = MeanScaleHyperpriorNet
    uses_means = True

    def _indexes_and_means(self, hyper_out):
        scales_hat, means_hat = jnp.split(hyper_out, 2, axis=-1)
        indexes = build_indexes(scales_hat, jnp.asarray(self.scale_table))
        return indexes, means_hat
