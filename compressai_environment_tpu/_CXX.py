"""API-parity shim for the reference's ``compressai._CXX`` extension
(``cpp_exts/ops/ops.cpp:111-118``): ``pmf_to_quantized_cdf``."""

from .entropy.cdf import pmf_to_quantized_cdf as _pmf_to_quantized_cdf

__all__ = ["pmf_to_quantized_cdf"]


def pmf_to_quantized_cdf(pmf, precision: int = 16):
    return _pmf_to_quantized_cdf(pmf, precision).tolist()
