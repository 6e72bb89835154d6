from .base import CdfTables, compress_symbols, decompress_symbols
from .bottleneck import EntropyBottleneck
from .gaussian import (
    SCALES_LEVELS,
    SCALES_MAX,
    SCALES_MIN,
    GaussianConditional,
    build_indexes,
    get_scale_table,
)
from . import bottleneck, gaussian

__all__ = [
    "CdfTables",
    "compress_symbols",
    "decompress_symbols",
    "EntropyBottleneck",
    "GaussianConditional",
    "build_indexes",
    "get_scale_table",
    "SCALES_MIN",
    "SCALES_MAX",
    "SCALES_LEVELS",
    "bottleneck",
    "gaussian",
]
