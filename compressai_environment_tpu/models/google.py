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


def _chunked_synthesis(net, p, y_hat, cdt, decode_method, max_chunk=32):
    """Synthesis transform with bounded peak memory: above ``max_chunk``
    images the g_s stack is applied as a ``lax.map`` over equal sub-batches
    INSIDE the same jit (one dispatch, serialized chunks). A batch-96
    single-shot decode did not fit 16 GB HBM (the f32 GDN norm at the
    largest scale alone is ~4.8 GB); chunking divides synthesis peak
    memory by the chunk count while the (small) entropy core stays
    full-batch. Encode needs no such treatment — its per-layer peaks
    shrink with depth."""
    B = y_hat.shape[0]
    if B <= max_chunk:
        return net.apply(p, y_hat.astype(cdt), method=decode_method)
    cs = max(c for c in range(1, max_chunk + 1) if B % c == 0)
    yc = y_hat.reshape(B // cs, cs, *y_hat.shape[1:])
    xc = jax.lax.map(
        lambda v: net.apply(p, v.astype(cdt), method=decode_method), yc
    )
    return xc.reshape(B, *xc.shape[2:])


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
        m = self._host_cache.get("medians")
        if m is None:
            m = np.asarray(
                self.params["entropy_bottleneck"]["quantiles"], np.float32
            )[:, 0, 1]
            self._host_cache["medians"] = m
        return m

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
                    return _chunked_synthesis(
                        net, p, y_hat, cdt, FactorizedPriorNet.decode
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
                return _chunked_synthesis(
                    net, p, y_hat, cdt, FactorizedPriorNet.decode
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
        m = self._host_cache.get("medians")
        if m is None:
            m = np.asarray(
                self.params["entropy_bottleneck"]["quantiles"], np.float32
            )[:, 0, 1]
            self._host_cache["medians"] = m
        return m

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
        sharded = (
            isinstance(x, jax.Array) and len(x.sharding.device_set) > 1
        )
        if (
            self.stream_format == "tpu" and not sharded
            and self.tables["y"].device_compact is not None
        ):
            # single-device: the fused single-dispatch path
            return self.compress_async(x).result()
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
        overlaps D2H with the next sub-batch's compute.

        With compact y-tables the ENTIRE encode — g_a, h_a, z coding,
        encoder-side z_hat, h_s, index building and y coding — is ONE fused
        jit dispatch (every separate dispatch costs a tunnel RPC round trip,
        ~25 ms measured; the split path paid ~8 of them)."""
        if self.stream_format != "tpu":
            out = self.compress(x)
            return type("_Done", (), {"result": staticmethod(lambda: out)})()
        self._require_tables("y", "z")
        y_tab, z_tab = self.tables["y"], self.tables["z"]
        y_ct = y_tab.device_compact
        if y_ct is None:
            return self._compress_async_split(x)

        from ..entropy import vrans

        x_dev = jnp.asarray(x)
        is_u8 = x_dev.dtype == jnp.uint8
        B, H, W = x_dev.shape[0], x_dev.shape[1], x_dev.shape[2]
        if H % 64 or W % 64:
            # non-x64 sizes break the y == 4*z spatial relation the fused
            # decode relies on; keep the split-dispatch path
            return self._compress_async_split(x_dev)
        hy, wy = H // 16, W // 16
        hz, wz = H // 64, W // 64
        M, N = self.M, self._eb_channels()
        n_y, n_z = hy * wy * M, hz * wz * N
        z_hw = hz * wz
        y_lanes = vrans.pick_lanes(n_y)
        y_T = -(-n_y // y_lanes)
        y_wcap = min(max(8, (y_T * 10) // 16 + 4), y_T + 2)
        z_rt = z_tab.device_rowseq
        z_rl = vrans.rowseq_lanes(n_z, z_hw)
        z_rowseq = z_rt is not None and z_rl is not None
        if z_rowseq:
            z_lanes, z_T = z_rl, n_z // z_rl
            z_rows = vrans.rowseq_schedule(N, z_hw, z_lanes)
        else:
            z_ct = z_tab.device_compact
            if z_ct is None:
                raise NotImplementedError("fused path needs compact z tables")
            z_lanes = vrans.pick_lanes(n_z)
            z_T = -(-n_z // z_lanes)
        z_wcap = min(max(8, (z_T * 10) // 16 + 4), z_T + 2)
        z_med = self._medians()
        cdt = self._compute_dtype
        net, net_cls = self.net, self.net_cls
        uses_means = self.uses_means

        def fused(p, v, y_enc_hi, y_enc_lo, *z_args):
            vv = (
                v.astype(cdt) / np.asarray(255.0, cdt) if is_u8
                else v.astype(cdt)
            )
            y, z = net.apply(p, vv, method=net_cls.encode)
            zf = z.astype(jnp.float32)
            if z_rowseq:
                zp = zf.transpose(0, 3, 1, 2).reshape(B, -1)
                z_sym = jnp.round(
                    zp - jnp.asarray(np.repeat(z_med, z_hw))
                ).astype(jnp.int32)
                z_out = vrans._encode_device_core_rowseq(
                    z_sym, jnp.asarray(z_rows), *z_args,
                    T=z_T, lanes=z_lanes, w_cap=z_wcap,
                )
            else:
                z_sym = jnp.round(
                    zf - jnp.asarray(z_med)
                ).astype(jnp.int32).reshape(B, -1)
                z_idx = jnp.broadcast_to(
                    jnp.arange(N, dtype=jnp.int32), z.shape
                ).reshape(B, -1)
                z_out = vrans._encode_device_core_onehot(
                    z_sym, z_idx, *z_args, T=z_T, lanes=z_lanes, w_cap=z_wcap,
                )
            z_hat = jnp.round(zf - jnp.asarray(z_med)) + jnp.asarray(z_med)
            hyper_out = net.apply(
                p, z_hat.astype(cdt), method=net_cls.hyper_decode
            )
            indexes, means = self._indexes_and_means(hyper_out)
            vals = y.astype(jnp.float32)
            if uses_means:
                vals = vals - means.astype(jnp.float32)
            y_sym = jnp.round(vals).astype(jnp.int32).reshape(B, -1)
            y_idx = indexes.reshape(B, -1)
            y_out = vrans._encode_device_core_onehot(
                y_sym, y_idx, y_enc_hi, y_enc_lo, y_T, y_lanes, y_wcap,
            )
            return z_out, y_out, z_sym, y_sym, y_idx

        z_tab_args = (
            (z_rt["start"], z_rt["freq"], z_rt["off"], z_rt["maxv"],
             z_rt["k"]) if z_rowseq
            else (z_tab.device_compact["enc_hi"],
                  z_tab.device_compact["enc_lo"])
        )
        key = f"enc_fused_hp_{x_dev.shape}_{x_dev.dtype}_{y_lanes}_{z_lanes}"
        z_out, y_out, z_sym, y_sym, y_idx = self._jitted(key, fused)(
            {"params": self.params}, x_dev, y_ct["enc_hi"], y_ct["enc_lo"],
            *z_tab_args,
        )
        y_handle = vrans.EncodeDeviceHandle.from_core_outputs(
            y_out, y_sym, lambda: np.asarray(y_idx),
            y_tab, n_y, y_lanes, y_wcap,
        )
        z_handle = vrans.EncodeDeviceHandle.from_core_outputs(
            z_out, z_sym,
            (None if z_rowseq else lambda: np.broadcast_to(
                np.arange(N, dtype=np.int32), (B, hz, wz, N)
            ).reshape(B, -1)),
            z_tab, n_z, z_lanes, z_wcap,
        )
        if z_rowseq:
            z_handle._flags = vrans._FLAG_STEPMAJOR
            z_rows_dev = jnp.asarray(z_rows)
            z_handle._retry = lambda: (
                vrans._encode_device_core_rowseq(
                    z_sym, z_rows_dev, *z_tab_args,
                    T=z_T, lanes=z_lanes, w_cap=z_T + 2,
                ),
                z_T + 2,
            )
        shape = (hz, wz)

        class _FusedHandle:
            @staticmethod
            def result():
                return {
                    "strings": [y_handle.result(), z_handle.result()],
                    "shape": shape,
                }

        return _FusedHandle()

    def _compress_async_split(self, x):
        """Separate-dispatch tpu encode (non-compact tables, or sizes where
        the fused path's spatial relations don't hold)."""
        y_tab, z_tab = self.tables["y"], self.tables["z"]
        x = self._nhwc(x)
        encode = self._jitted(
            "encode",
            lambda p, v: self.net.apply(p, v, method=self.net_cls.encode),
        )
        y, z = encode({"params": self.params}, x)
        z_handle = eb_ops.compress_async(z, self._medians(), z_tab)
        z_hat = self._z_hat_on_device(z)
        hyper = self._jitted(
            "hyper_decode",
            lambda p, v: self.net.apply(
                p, v, method=self.net_cls.hyper_decode),
        )
        out = hyper({"params": self.params}, self._cast(z_hat))
        indexes, means = self._indexes_and_means(out)
        y_handle = gc_ops.compress_async(y, indexes, y_tab, means)
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
        y_tab, z_tab = self.tables["y"], self.tables["z"]
        y_ct = y_tab.device_compact
        if (
            self.stream_format == "tpu" and sharding is None
            and y_ct is not None
        ):
            # ONE fused jit: z decode + h_s + index building + y decode +
            # dequantize + g_s (cf. compress_async)
            from ..entropy import vrans

            B = len(strings[0])
            hz, wz = tuple(shape)
            hy, wy = hz * 4, wz * 4
            M, N = self.M, self._eb_channels()
            n_y, n_z = hy * wy * M, hz * wz * N
            if vrans._unpack_header_counts(strings[0][0])[0] != n_y:
                # stream came from a non-x64-padded input (split encode
                # path, y != 4*z spatially): decode with the split path too
                return self._decompress_split(strings, shape)
            y_prep = vrans.prepare_decode_blobs(strings[0], n_y)
            z_prep = vrans.prepare_decode_blobs(strings[1], n_z)
            z_med = self._medians()
            cdt = self._compute_dtype
            net, net_cls = self.net, self.net_cls
            uses_means = self.uses_means
            z_rowseq = z_prep["stepmajor"]
            if z_rowseq:
                z_rows = vrans.rowseq_schedule(N, hz * wz, z_prep["lanes"])
                z_rt = z_tab.device_rowseq
                z_tab_args = (z_rt["search"], z_rt["off"], z_rt["maxv"],
                              z_rt["k"])
            else:
                z_ct = z_tab.device_compact
                z_tab_args = (z_ct["dec_hi"], z_ct["dec_lo"])

            def fused(p, yf, yc, yr, zf_, zc, zr, y_dec_hi, y_dec_lo,
                      *z_args):
                if z_rowseq:
                    z_sym = vrans._decode_device_core_rowseq(
                        zf_, zc, jnp.asarray(z_rows), zr, *z_args,
                        T=z_prep["T"], lanes=z_prep["lanes"],
                        max_w=z_prep["max_w"], has_raw=z_prep["has_raw"],
                    )
                    zp = (
                        z_sym.astype(jnp.float32)
                        + jnp.asarray(np.repeat(z_med, hz * wz))
                    )
                    z_hat = zp.reshape(B, N, hz, wz).transpose(0, 2, 3, 1)
                else:
                    z_idx = jnp.broadcast_to(
                        jnp.arange(N, dtype=jnp.int32), (B, hz, wz, N)
                    ).reshape(B, -1)
                    z_sym = vrans._decode_device_core_onehot(
                        zf_, zc, z_idx, zr, *z_args,
                        T=z_prep["T"], lanes=z_prep["lanes"],
                        max_w=z_prep["max_w"], has_raw=z_prep["has_raw"],
                    )
                    z_hat = (
                        z_sym.reshape(B, hz, wz, N).astype(jnp.float32)
                        + jnp.asarray(z_med)
                    )
                hyper_out = net.apply(
                    p, z_hat.astype(cdt), method=net_cls.hyper_decode
                )
                indexes, means = self._indexes_and_means(hyper_out)
                y_sym = vrans._decode_device_core_onehot(
                    yf, yc, indexes.reshape(B, -1), yr, y_dec_hi, y_dec_lo,
                    T=y_prep["T"], lanes=y_prep["lanes"],
                    max_w=y_prep["max_w"], has_raw=y_prep["has_raw"],
                )
                y_hat = y_sym.reshape(B, hy, wy, M).astype(jnp.float32)
                if uses_means:
                    y_hat = y_hat + means.astype(jnp.float32)
                return _chunked_synthesis(net, p, y_hat, cdt, net_cls.decode)

            key = (
                f"dec_fused_hp_{B}_{hz}x{wz}_{y_prep['lanes']}_"
                f"{y_prep['max_w']}_{y_prep['has_raw']}_"
                f"{y_prep['raw'].shape}_{y_prep['stream_all'].shape}_"
                f"{z_prep['lanes']}_{z_prep['max_w']}_{z_prep['has_raw']}_"
                f"{z_prep['raw'].shape}_{z_prep['stream_all'].shape}_"
                f"{z_rowseq}"
            )
            x_hat = self._jitted(key, fused)(
                {"params": self.params},
                jnp.asarray(y_prep["stream_all"]),
                jnp.asarray(y_prep["counts_all"].astype(np.int32)),
                jnp.asarray(y_prep["raw"]),
                jnp.asarray(z_prep["stream_all"]),
                jnp.asarray(z_prep["counts_all"].astype(np.int32)),
                jnp.asarray(z_prep["raw"]),
                y_ct["dec_hi"], y_ct["dec_lo"], *z_tab_args,
            )
            return {"x_hat": x_hat.astype(jnp.float32)}
        return self._decompress_split(strings, shape, sharding=sharding)

    def _decompress_split(self, strings, shape, sharding=None):
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
