from .bound import LowerBound, lower_bound
from .parametrizers import NonNegativeParametrizer
from .quant import dequantize, quantize, quantize_ste, ste_round

__all__ = [
    "LowerBound",
    "lower_bound",
    "NonNegativeParametrizer",
    "ste_round",
    "quantize_ste",
    "quantize",
    "dequantize",
]
