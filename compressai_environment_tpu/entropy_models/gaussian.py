"""GaussianConditional: N(means, scales^2) entropy model with a shared scale
table (reference ``entropy_models.py:551-689``).

Device math (likelihoods, index building) is pure jittable JAX; table
construction runs on host numpy at ``update()`` time. ``build_indexes`` is a
vectorized ``searchsorted`` instead of the reference's per-entry comparison
loop (``entropy_models.py:684-689``) — identical results, one fused kernel.
"""

from __future__ import annotations

import math
import statistics

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

__all__ = [
    "GaussianConditional",
    "build_tables",
    "build_indexes",
    "compress",
    "decompress",
    "SCALES_MIN",
    "SCALES_MAX",
    "SCALES_LEVELS",
    "get_scale_table",
]

# From Ballé's tensorflow compression examples
# (reference models/google.py:195-201)
SCALES_MIN = 0.11
SCALES_MAX = 256
SCALES_LEVELS = 64


def get_scale_table(min=SCALES_MIN, max=SCALES_MAX, levels=SCALES_LEVELS):
    from . import torch_exact

    if torch_exact.available():
        # fp32 values feed the CDF rows; match reference bitwise
        return torch_exact.get_scale_table(min, max, levels)
    return np.exp(
        np.linspace(math.log(min), math.log(max), levels, dtype=np.float64)
    ).astype(np.float32)


def _std_quantile(q: float) -> float:
    """Standard normal quantile. scipy when available (reference parity);
    stdlib NormalDist otherwise."""
    try:
        import scipy.stats

        return float(scipy.stats.norm.ppf(q))
    except ImportError:  # pragma: no cover
        return statistics.NormalDist().inv_cdf(q)


def _std_cumulative_np(x: np.ndarray) -> np.ndarray:
    """0.5 * erfc(-x / sqrt(2)) in float32 (reference
    ``_standardized_cumulative``, ``entropy_models.py:604-608``)."""
    try:
        from scipy.special import erfc

        return (0.5 * erfc(np.float32(-(2**-0.5)) * x)).astype(np.float32)
    except ImportError:  # pragma: no cover
        v = np.vectorize(math.erfc)(np.float64(-(2**-0.5)) * x)
        return (0.5 * v).astype(np.float32)


class GaussianConditional(nn.Module):
    scale_bound: float = 0.11
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def _standardized_cumulative(self, inputs):
        # erfc maximizes numerical precision vs. 1 - cdf
        const = -(2**-0.5)
        return 0.5 * jax.lax.erfc(const * inputs)

    def _likelihood(self, inputs, scales, means=None):
        values = inputs - means if means is not None else inputs
        scales = lower_bound(scales, self.scale_bound)
        values = jnp.abs(values)
        upper = self._standardized_cumulative((0.5 - values) / scales)
        lower = self._standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    def __call__(self, inputs, scales, means=None, training: bool = True, key=None):
        if training:
            if key is None:
                key = self.make_rng("noise")
            outputs = quantize_fn(inputs, "noise", key=key)
        else:
            outputs = quantize_fn(inputs, "dequantize", means)
        likelihood = self._likelihood(outputs, scales, means)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(likelihood, self.likelihood_bound)
        return outputs, likelihood


def build_indexes(scales, scale_table, scale_bound: float = 0.11):
    """Map each scale to the smallest scale-table entry >= scale.

    Jittable; equivalent to the reference comparison-sum loop.
    """
    scale_table = jnp.asarray(scale_table)
    scales = lower_bound(scales, scale_bound)
    return jnp.searchsorted(
        scale_table[:-1], scales, side="left"
    ).astype(jnp.int32)


def build_tables(scale_table, tail_mass: float = 1e-9) -> CdfTables:
    """One CDF row per table scale (reference ``GaussianConditional.update``,
    ``entropy_models.py:625-648``).

    Torch-exact baking when torch is importable (byte-compatible tables, see
    ``torch_exact.py``); pure numpy fallback below."""
    from . import torch_exact

    if torch_exact.available():
        return torch_exact.gc_build_tables(scale_table, tail_mass)

    scale_table = np.asarray(scale_table, np.float32)
    multiplier = -_std_quantile(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(
        np.arange(max_length, dtype=np.int32) - pmf_center[:, None]
    ).astype(np.float32)
    samples_scale = scale_table[:, None].astype(np.float32)
    upper = _std_cumulative_np((0.5 - samples) / samples_scale)
    lower = _std_cumulative_np((-0.5 - samples) / samples_scale)
    pmf = upper - lower
    tail_mass_arr = 2 * lower[:, :1]

    quantized_cdf = pmf_to_quantized_cdf_batch(
        pmf, tail_mass_arr, pmf_length, max_length
    )
    return CdfTables(quantized_cdf, pmf_length + 2, -pmf_center)


def compress(inputs, indexes, tables: CdfTables, means=None, fmt: str = "rans"):
    """Quantize to symbols and encode; inputs/indexes: (B, ...).

    "tpu": quantization and coding run on device from device arrays."""
    if fmt == "tpu":
        from ..entropy import vrans

        inputs = jnp.asarray(inputs)
        b = inputs.shape[0]
        values = inputs - jnp.asarray(means) if means is not None else inputs
        symbols = jnp.round(values).astype(jnp.int32).reshape(b, -1)
        idx = jnp.asarray(indexes).reshape(b, -1)
        return vrans.encode_batch_device(symbols, idx, tables)

    # "rans": reference layout — flatten each batch element channel-major
    # (C, *spatial) to match torch NCHW ``reshape(-1)`` in reference
    # ``entropy_models.py:258-267``.
    inputs = np.asarray(inputs)
    values = inputs - np.asarray(means) if means is not None else inputs
    symbols = np.round(values).astype(np.int32)
    symbols = np.moveaxis(symbols, -1, 1)
    idx = np.moveaxis(np.asarray(indexes), -1, 1)
    return compress_symbols(symbols, idx, tables, backend=fmt)


def compress_async(inputs, indexes, tables: CdfTables, means=None,
                   lanes=None):
    """Two-phase "tpu"-format encode (cf. ``bottleneck.compress_async``):
    dispatch now, fetch blobs via ``handle.result()``. ``lanes`` overrides
    the default (speed-biased callers; the blob self-describes it)."""
    from ..entropy import vrans

    inputs = jnp.asarray(inputs)
    b = inputs.shape[0]
    values = inputs - jnp.asarray(means) if means is not None else inputs
    symbols = jnp.round(values).astype(jnp.int32).reshape(b, -1)
    idx = jnp.asarray(indexes).reshape(b, -1)
    return vrans.EncodeDeviceHandle(symbols, idx, tables, lanes)


def decompress(strings, indexes, tables: CdfTables, means=None,
               fmt: str = "rans", sharding=None):
    """"tpu": decodes on device and returns a device array; ``sharding``
    shards the decode over a mesh batch axis."""
    if fmt == "tpu":
        from ..entropy import vrans

        idx = jnp.asarray(indexes)
        b = idx.shape[0]
        symbols = vrans.decode_batch_device(
            strings, idx.reshape(b, -1), tables, sharding=sharding
        ).reshape(idx.shape)
        if means is not None:
            return symbols.astype(jnp.float32) + jnp.asarray(means, jnp.float32)
        return symbols.astype(jnp.float32)
    idx = np.moveaxis(np.asarray(indexes), -1, 1)
    symbols = decompress_symbols(strings, idx, tables, backend=fmt)
    symbols = np.moveaxis(symbols, 1, -1)
    if means is not None:
        return symbols.astype(np.float32) + np.asarray(means, np.float32)
    return symbols.astype(np.float32)
