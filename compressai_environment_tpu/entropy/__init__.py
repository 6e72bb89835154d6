"""Entropy-coding core: quantized-CDF construction and the rANS codec."""

from .cdf import pmf_to_quantized_cdf, pmf_to_quantized_cdf_batch
from .coder import (
    BufferedEncoder,
    Decoder,
    Encoder,
    StreamDecoder,
    decode_batch,
    decode_with_indexes,
    encode_batch,
    encode_with_indexes,
)

__all__ = [
    "pmf_to_quantized_cdf",
    "pmf_to_quantized_cdf_batch",
    "Encoder",
    "Decoder",
    "BufferedEncoder",
    "StreamDecoder",
    "encode_with_indexes",
    "decode_with_indexes",
    "encode_batch",
    "decode_batch",
]
