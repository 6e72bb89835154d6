"""Bit-exact CDF table baking via torch fp32 arithmetic (host-only, optional).

``update()`` samples learned densities into integer CDF tables; every bit of
every bitstream depends on those integers. The reference bakes them with
torch fp32 ops (``entropy_models.py:389-429`` for EntropyBottleneck,
``:614-648`` for GaussianConditional). Reproducing those integers exactly
requires reproducing the fp32 arithmetic exactly — and fp32 transcendentals
(tanh, softplus, erfc) differ by ~1 ulp between torch's SLEEF/MKL kernels and
numpy/XLA libm, which shifts the 16-bit quantized CDFs by ±1 and breaks
cross-ecosystem byte equality.

This module evaluates the density with the same torch ops in the same order
as the reference, so a checkpoint baked here is byte-compatible with one
baked by the reference tooling. It is an offline, one-time, host-side step —
the TPU coding path consumes the resulting integer tables unchanged. When
torch is not installed, callers fall back to the pure numpy/JAX builders
(self-consistent streams; identical lengths/offsets, CDF bins within
2/65536 of reference baking — enforced by ``tests/test_pure_tables.py``).

Set ``COMPRESSAI_TPU_PURE_TABLES=1`` to force the pure fallback.
"""

from __future__ import annotations

import math
import os

import numpy as np

from ..entropy.cdf import pmf_to_quantized_cdf_batch

__all__ = ["available", "eb_build_tables", "gc_build_tables", "get_scale_table"]


def available() -> bool:
    if os.environ.get("COMPRESSAI_TPU_PURE_TABLES"):
        return False
    try:
        import torch  # noqa: F401

        return True
    except ImportError:  # pragma: no cover
        return False


def _logits_cumulative(params, logits):
    """Reference ``EntropyBottleneck._logits_cumulative``
    (``entropy_models.py:436-455``), fp32 torch ops in identical order."""
    import torch
    import torch.nn.functional as F

    nstages = sum(1 for k in params if k.startswith("_matrix"))
    for i in range(nstages):
        matrix = torch.from_numpy(np.array(params[f"_matrix{i}"], np.float32))
        logits = torch.matmul(F.softplus(matrix), logits)
        logits = logits + torch.from_numpy(
            np.array(params[f"_bias{i}"], np.float32)
        )
        if i < nstages - 1:
            factor = torch.from_numpy(
                np.array(params[f"_factor{i}"], np.float32)
            )
            logits = logits + torch.tanh(factor) * torch.tanh(logits)
    return logits


def eb_build_tables(params):
    """EntropyBottleneck density -> CdfTables, byte-compatible with reference
    ``update()`` (``entropy_models.py:389-429``)."""
    import torch

    from .base import CdfTables

    with torch.no_grad():
        quantiles = torch.from_numpy(np.array(params["quantiles"], np.float32))
        medians = quantiles[:, 0, 1]
        minima = torch.clamp(torch.ceil(medians - quantiles[:, 0, 0]).int(), min=0)
        maxima = torch.clamp(torch.ceil(quantiles[:, 0, 2] - medians).int(), min=0)

        offset = -minima
        pmf_start = medians - minima
        pmf_length = maxima + minima + 1
        max_length = int(pmf_length.max().item())

        samples = torch.arange(max_length)
        samples = samples[None, :] + pmf_start[:, None, None]

        lower = _logits_cumulative(params, samples - 0.5)
        upper = _logits_cumulative(params, samples + 0.5)
        sign = -torch.sign(lower + upper)
        pmf = torch.abs(torch.sigmoid(sign * upper) - torch.sigmoid(sign * lower))
        pmf = pmf[:, 0, :]
        tail_mass = torch.sigmoid(lower[:, 0, :1]) + torch.sigmoid(-upper[:, 0, -1:])

    pmf_length_np = pmf_length.numpy().astype(np.int32)
    quantized_cdf = pmf_to_quantized_cdf_batch(
        pmf.numpy(), tail_mass.numpy(), pmf_length_np, max_length
    )
    return CdfTables(quantized_cdf, pmf_length_np + 2, offset.numpy())


def gc_build_tables(scale_table, tail_mass: float = 1e-9):
    """GaussianConditional scale-table rows -> CdfTables, byte-compatible
    with reference ``update()`` (``entropy_models.py:614-648``)."""
    import torch

    from .base import CdfTables
    from .gaussian import _std_quantile

    with torch.no_grad():
        st = torch.from_numpy(np.array(scale_table, np.float32))
        multiplier = -_std_quantile(tail_mass / 2)
        pmf_center = torch.ceil(st * multiplier).int()
        pmf_length = 2 * pmf_center + 1
        max_length = int(torch.max(pmf_length).item())

        samples = torch.abs(
            torch.arange(max_length).int() - pmf_center[:, None]
        )
        samples_scale = st.unsqueeze(1)
        samples = samples.float()
        const = float(-(2**-0.5))
        upper = 0.5 * torch.erfc(const * ((0.5 - samples) / samples_scale))
        lower = 0.5 * torch.erfc(const * ((-0.5 - samples) / samples_scale))
        pmf = upper - lower
        tail = 2 * lower[:, :1]

    pmf_length_np = pmf_length.numpy().astype(np.int32)
    quantized_cdf = pmf_to_quantized_cdf_batch(
        pmf.numpy(), tail.numpy(), pmf_length_np, max_length
    )
    return CdfTables(quantized_cdf, pmf_length_np + 2, -pmf_center.numpy())


def get_scale_table(min_=0.11, max_=256, levels=64) -> np.ndarray:
    """fp32 scale table via torch (reference ``models/google.py:200-201``) —
    the exact fp32 values feed the CDF rows, so they must match bitwise."""
    import torch

    return torch.exp(
        torch.linspace(math.log(min_), math.log(max_), levels)
    ).numpy()
