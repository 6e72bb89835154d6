"""EntropyBottleneck: non-parametric factorized prior (Ballé et al. 2018 §6.1).

Re-implementation of the reference ``EntropyBottleneck``
(``entropy_models.py:328-548``) as a flax module over channel-last tensors.
The per-channel monotone density MLP (``_logits_cumulative``) is expressed as
batched matmuls over the channel axis, which XLA maps to a single fused
einsum; parameter names and shapes match the torch module (``_matrix{i}``,
``_bias{i}``, ``_factor{i}``, ``quantiles``) so checkpoints import directly.

Codec-side helpers (``build_tables``, ``compress``, ``decompress``) live at
module scope: they mix jitted device math with the host rANS coder.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.cdf import pmf_to_quantized_cdf_batch
from ..ops.bound import lower_bound
from ..ops.quant import quantize as quantize_fn
from .base import (
    CdfTables,
    compress_symbols,
    compress_symbols_interleaved,
    decompress_symbols,
    decompress_symbols_interleaved,
)

__all__ = ["EntropyBottleneck", "build_tables", "compress", "decompress"]


class EntropyBottleneck(nn.Module):
    channels: int
    tail_mass: float = 1e-9
    init_scale: float = 10.0
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    likelihood_bound: float = 1e-9

    def setup(self):
        filters = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        c = self.channels

        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1 / scale / filters[i + 1]))
            matrices.append(
                self.param(
                    f"_matrix{i}",
                    lambda key, shape=None, v=init, s=(c, filters[i + 1], filters[i]):
                        jnp.full(s, v, jnp.float32),
                )
            )
            biases.append(
                self.param(
                    f"_bias{i}",
                    lambda key, s=(c, filters[i + 1], 1): jax.random.uniform(
                        key, s, jnp.float32, -0.5, 0.5
                    ),
                )
            )
            if i < len(self.filters):
                factors.append(
                    self.param(
                        f"_factor{i}",
                        lambda key, s=(c, filters[i + 1], 1): jnp.zeros(s, jnp.float32),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

        self.quantiles = self.param(
            "quantiles",
            lambda key: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale], jnp.float32),
                (c, 1, 1),
            ),
        )

    # -- density ----------------------------------------------------------
    def _logits_cumulative(self, inputs, stop_gradient: bool):
        """inputs: (C, 1, N) -> cumulative logits, same shape
        (reference ``entropy_models.py:436-455``)."""
        sg = jax.lax.stop_gradient if stop_gradient else (lambda x: x)
        logits = inputs
        for i in range(len(self.filters) + 1):
            logits = jnp.matmul(
                jax.nn.softplus(sg(self._matrices[i])), logits,
                preferred_element_type=jnp.float32,
            )
            logits = logits + sg(self._biases[i])
            if i < len(self.filters):
                logits = logits + jnp.tanh(sg(self._factors[i])) * jnp.tanh(logits)
        return logits

    def logits_cumulative(self, inputs, stop_gradient: bool = True):
        """Public apply-method for table building."""
        return self._logits_cumulative(inputs, stop_gradient)

    def medians(self):
        return self.quantiles[:, 0, 1]

    def _likelihood(self, inputs):
        lower = self._logits_cumulative(inputs - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(inputs + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )

    def aux_loss(self):
        """Quantile-fitting loss (reference ``loss()``,
        ``entropy_models.py:431-434``)."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        target = math.log(2 / self.tail_mass - 1)
        tgt = jnp.array([-target, 0.0, target], jnp.float32)
        return jnp.sum(jnp.abs(logits - tgt))

    def __call__(self, x, training: bool = True, key=None):
        """x: channel-last (..., C). Returns (x_hat, likelihoods)."""
        # (..., C) -> (C, 1, N)
        in_shape = x.shape
        perm = (x.ndim - 1,) + tuple(range(x.ndim - 1))
        values = jnp.transpose(x, perm).reshape(self.channels, 1, -1)

        medians = self.quantiles[:, :, 1:2]
        if training:
            if key is None:
                key = self.make_rng("noise")
            outputs = quantize_fn(values, "noise", key=key)
        else:
            outputs = quantize_fn(values, "dequantize", medians)

        likelihood = self._likelihood(outputs)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(likelihood, self.likelihood_bound)

        inv_perm = tuple(range(1, x.ndim)) + (0,)
        back = lambda v: jnp.transpose(
            v.reshape((self.channels,) + in_shape[:-1]), inv_perm
        )
        return back(outputs), back(likelihood)


# ---------------------------------------------------------------------------
# Codec-side helpers (host + device mix; not traced end-to-end)
# ---------------------------------------------------------------------------


def build_tables(module: EntropyBottleneck, params) -> CdfTables:
    """Sample the learned density into quantized CDF tables
    (reference ``EntropyBottleneck.update``, ``entropy_models.py:389-429``).

    Uses the torch-exact baking path when torch is importable so the integer
    tables are byte-compatible with reference tooling (see
    ``torch_exact.py``); otherwise the pure numpy/JAX evaluation below."""
    from . import torch_exact

    if torch_exact.available():
        return torch_exact.eb_build_tables(params)

    quantiles = np.asarray(params["quantiles"], np.float32)  # (C, 1, 3)
    medians = quantiles[:, 0, 1]

    minima = np.clip(np.ceil(medians - quantiles[:, 0, 0]).astype(np.int32), 0, None)
    maxima = np.clip(np.ceil(quantiles[:, 0, 2] - medians).astype(np.int32), 0, None)

    offset = -minima
    pmf_start = medians - minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    samples = np.arange(max_length, dtype=np.float32)
    samples = samples[None, None, :] + pmf_start[:, None, None]  # (C, 1, L)

    def _logits(v):
        return module.apply(
            {"params": params}, jnp.asarray(v), True, method=EntropyBottleneck.logits_cumulative
        )

    lower = np.asarray(_logits(samples - 0.5), np.float32)
    upper = np.asarray(_logits(samples + 0.5), np.float32)
    sign = -np.sign(lower + upper)
    pmf = np.abs(_sigmoid(sign * upper) - _sigmoid(sign * lower))[:, 0, :]
    tail_mass = _sigmoid(lower[:, 0, :1]) + _sigmoid(-upper[:, 0, -1:])

    quantized_cdf = pmf_to_quantized_cdf_batch(pmf, tail_mass, pmf_length, max_length)
    return CdfTables(quantized_cdf, pmf_length + 2, offset)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def compress(x, medians: np.ndarray, tables: CdfTables, fmt: str = "rans"):
    """x: (B, ..., C) latent (numpy or device array); medians: (C,).
    Returns list of strings.

    fmt: "rans" (reference-bit-exact single stream) or "tpu" (interleaved
    lanes; quantization, escape folding and coding all happen on device).
    """
    if fmt == "tpu":
        return compress_async(x, medians, tables).result()

    # "rans": reference layout — each batch element is flattened
    # channel-major (C, *spatial), matching torch NCHW ``reshape(-1)`` in
    # reference ``entropy_models.py:258-267``. Byte-for-byte parity with the
    # reference coder depends on this order.
    x = np.asarray(x)
    c = x.shape[-1]
    xm = np.moveaxis(x, -1, 1)  # (B, C, *spatial)
    med = medians.reshape((c,) + (1,) * (xm.ndim - 2))
    symbols = np.round(xm - med).astype(np.int32)
    indexes = np.broadcast_to(
        np.arange(c, dtype=np.int32).reshape((c,) + (1,) * (xm.ndim - 2)),
        xm.shape[1:],
    )
    indexes = np.broadcast_to(indexes, xm.shape)
    return compress_symbols(symbols, indexes, tables, backend=fmt)


def _single_device(x) -> bool:
    sh = getattr(x, "sharding", None)
    return sh is None or len(sh.device_set) <= 1


def compress_async(x, medians: np.ndarray, tables: CdfTables, lanes=None):
    """Two-phase "tpu"-format encode: dispatches all device work and returns
    a handle; ``handle.result()`` fetches + packs blobs. Lets callers overlap
    one chunk's D2H with the next chunk's compute.

    Single-device inputs with channel-divisible spatial sizes take the
    row-sequential step-major path (planar layout, per-step constant CDF
    row — no one-hot select work at all, ``vrans._encode_device_core_rowseq``);
    mesh-sharded inputs keep the lane-blocked layout, which partitions over
    the batch axis. An explicit ``lanes`` override (speed-biased callers,
    e.g. the single-image video GOP loop) forces the lane-blocked layout
    with that count — the decoder reads the lane count from the blob, so no
    receiver coordination is needed."""
    from ..entropy import vrans

    x = jnp.asarray(x)
    b, c = x.shape[0], x.shape[-1]
    n = int(np.prod(x.shape[1:]))
    hw = n // c
    if lanes is None and (
        vrans.rowseq_lanes(n, hw) is not None and _single_device(x)
        and tables.device_rowseq is not None
    ):
        lanes = vrans.rowseq_lanes(n, hw)
        xp = jnp.moveaxis(x, -1, 1).reshape(b, -1)  # planar (channel-major)
        med_rep = jnp.repeat(jnp.asarray(medians, jnp.float32), hw)
        symbols = jnp.round(xp.astype(jnp.float32) - med_rep).astype(jnp.int32)
        return vrans.encode_rowseq_async(symbols, c, hw, tables, lanes)
    symbols = jnp.round(
        x - jnp.asarray(medians).reshape(-1)
    ).astype(jnp.int32).reshape(b, -1)
    indexes = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.int32), x.shape
    ).reshape(b, -1)
    return vrans.EncodeDeviceHandle(symbols, indexes, tables, lanes)


def decompress(strings, spatial_shape, medians: np.ndarray, tables: CdfTables,
               fmt: str = "rans", sharding=None):
    """Inverse of :func:`compress`; returns (B, *spatial_shape, C) float32.

    The "tpu" path decodes on device and returns a device array (no host
    round trip before the synthesis transform). ``sharding`` (tpu format
    only) shards the decode over a mesh batch axis."""
    c = tables.num_cdfs
    out_shape = (len(strings),) + tuple(spatial_shape) + (c,)
    if fmt == "tpu":
        from ..entropy import vrans

        b = len(strings)
        if strings and vrans.blob_flags(strings[0]) & vrans._FLAG_STEPMAJOR:
            hw = int(np.prod(spatial_shape))
            sym = vrans.decode_rowseq_batch(strings, c, hw, tables)
            sym = jnp.moveaxis(
                sym.reshape((b, c) + tuple(spatial_shape)), 1, -1
            )
            return (
                sym.astype(jnp.float32)
                + jnp.asarray(medians, jnp.float32).reshape(-1)
            )
        indexes = jnp.broadcast_to(
            jnp.arange(c, dtype=jnp.int32), out_shape
        ).reshape(b, -1)
        symbols = vrans.decode_batch_device(
            strings, indexes, tables, sharding=sharding
        )
        return (
            symbols.reshape(out_shape).astype(jnp.float32)
            + jnp.asarray(medians, jnp.float32).reshape(-1)
        )
    # reference layout: decode channel-major then restore channel-last
    cm_shape = (len(strings), c) + tuple(spatial_shape)
    indexes = np.broadcast_to(
        np.arange(c, dtype=np.int32).reshape((c,) + (1,) * len(spatial_shape)),
        cm_shape[1:],
    )
    indexes = np.broadcast_to(indexes, cm_shape)
    symbols = decompress_symbols(strings, indexes, tables, backend=fmt)
    symbols = np.moveaxis(symbols.reshape(cm_shape), 1, -1)
    return symbols.astype(np.float32) + np.asarray(medians, np.float32).reshape(-1)
