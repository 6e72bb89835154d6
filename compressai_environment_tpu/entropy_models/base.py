"""Shared machinery for entropy models: CDF table state and host coding glue.

The reference keeps quantized CDFs as registered torch buffers mutated by
``update()`` (``entropy_models.py:126-129``). Here they are an explicit
immutable pytree (:class:`CdfTables`) produced by each model's ``update``:
device-friendly (replicable over a mesh with one broadcast), checkpointable
(plain arrays), and passed to the host coder without per-call list conversion
(the reference's main encode bottleneck, ``entropy_models.py:258-267``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..entropy import coder

__all__ = ["CdfTables", "compress_symbols", "decompress_symbols"]


@dataclasses.dataclass(frozen=True)
class CdfTables:
    """Quantized CDF dictionary for one entropy model.

    Attributes:
        quantized_cdf: (n, max_len) int32; row i is a CDF over
            ``cdf_length[i]`` entries, zero padded.
        cdf_length: (n,) int32.
        offset: (n,) int32 symbol offset per CDF.
    """

    quantized_cdf: np.ndarray
    cdf_length: np.ndarray
    offset: np.ndarray

    def __post_init__(self):
        object.__setattr__(
            self, "quantized_cdf",
            np.ascontiguousarray(self.quantized_cdf, dtype=np.int32),
        )
        object.__setattr__(
            self, "cdf_length",
            np.ascontiguousarray(np.reshape(self.cdf_length, -1), dtype=np.int32),
        )
        object.__setattr__(
            self, "offset",
            np.ascontiguousarray(np.reshape(self.offset, -1), dtype=np.int32),
        )
        if self.quantized_cdf.ndim != 2:
            raise ValueError(f"Invalid CDF size {self.quantized_cdf.shape}")

    @property
    def num_cdfs(self) -> int:
        return self.quantized_cdf.shape[0]

    @property
    def decode_lut(self) -> np.ndarray:
        """Cached cum->symbol lookup table for the vectorized decoder."""
        lut = getattr(self, "_decode_lut", None)
        if lut is None:
            from ..entropy.vrans import build_decode_lut

            lut = build_decode_lut(self.quantized_cdf, self.cdf_length)
            object.__setattr__(self, "_decode_lut", lut)
        return lut

    @property
    def coding_cdf(self) -> np.ndarray:
        """The CDF the "tpu" stream format actually codes with: identical to
        ``quantized_cdf`` for narrow tables; for tables with folded wide rows
        (``vrans.build_folded_rows``) the synthesized per-symbol expansion,
        so host fallback paths produce byte-identical streams to the
        on-device folded one-hot cores. The "rans" reference-parity format
        always uses ``quantized_cdf``."""
        cdf = getattr(self, "_coding_cdf", None)
        if cdf is None:
            from ..entropy.vrans import build_coding_cdf

            cdf = build_coding_cdf(
                self.quantized_cdf, self.cdf_length, self.offset
            )
            object.__setattr__(self, "_coding_cdf", cdf)
        return cdf

    @property
    def coding_lut(self) -> np.ndarray:
        """``decode_lut`` over ``coding_cdf`` (same object when no row
        folds)."""
        if self.coding_cdf is self.quantized_cdf:
            return self.decode_lut
        lut = getattr(self, "_coding_lut", None)
        if lut is None:
            from ..entropy.vrans import build_decode_lut

            lut = build_decode_lut(self.coding_cdf, self.cdf_length)
            object.__setattr__(self, "_coding_lut", lut)
        return lut

    @property
    def device(self) -> dict:
        """Cached device copies (jnp arrays) of the tables. Normally includes
        the (n, 65536) decode LUT; under ``COMPRESSAI_TPU_LOW_MEM=1`` the LUT
        is replaced by the compact padded-search CDF (``cdf_search``) and
        decode falls back to on-device binary search."""
        dev = getattr(self, "_device_arrays", None)
        if dev is None:
            import jax.numpy as jnp

            from ..entropy.vrans import build_search_cdf, low_memory_mode

            dev = {
                "cdf": jnp.asarray(self.quantized_cdf),
                "sizes": jnp.asarray(self.cdf_length),
                "offsets": jnp.asarray(self.offset),
            }
            if low_memory_mode():
                dev["cdf_search"] = jnp.asarray(
                    build_search_cdf(self.quantized_cdf, self.cdf_length)
                )
            else:
                dev["lut"] = jnp.asarray(self.decode_lut)
            object.__setattr__(self, "_device_arrays", dev)
        return dev

    @property
    def device_compact(self):
        """Cached device copies of the gather-free one-hot coding tables
        (``vrans.build_compact_tables``): split-byte bf16 matrices over the
        compact (rows, stride) CDF, ~4 KB/row. Returns None for wide tables
        (stride > ``vrans.ONEHOT_MAX_STRIDE``) or out-of-int16-range values —
        those fall back to the packed sf-gather path. Available in low-memory
        mode too (it IS the low-memory representation, and the fastest)."""
        dev = getattr(self, "_device_compact", "unset")
        if dev == "unset":
            import jax.numpy as jnp

            from ..entropy.vrans import build_compact_tables

            host = build_compact_tables(
                self.quantized_cdf, self.cdf_length, self.offset
            )
            dev = (
                {k: jnp.asarray(v).astype(jnp.bfloat16) for k, v in host.items()}
                if host is not None else None
            )
            object.__setattr__(self, "_device_compact", dev)
        return dev

    @property
    def device_rowseq(self):
        """Cached device copies of the integer coarse tables for the
        row-sequential (step-major) cores (``vrans.build_rowseq_tables``);
        None when the compact gates fail. Same fold semantics as
        ``device_compact`` — the two core families are stream-compatible."""
        dev = getattr(self, "_device_rowseq", "unset")
        if dev == "unset":
            import jax.numpy as jnp

            from ..entropy.vrans import build_rowseq_tables

            host = build_rowseq_tables(
                self.quantized_cdf, self.cdf_length, self.offset
            )
            dev = (
                {k: jnp.asarray(v) for k, v in host.items()}
                if host is not None else None
            )
            object.__setattr__(self, "_device_rowseq", dev)
        return dev

    @property
    def device_packed(self):
        """Cached device copies of the gather-minimizing packed tables
        (``vrans.build_packed_tables``), or None if the table ranges don't
        fit the packed encoding — or if low-memory mode is on (the packed
        sf/post tables cost ~0.4 MB/row of device HBM)."""
        dev = getattr(self, "_device_packed", "unset")
        if dev == "unset":
            import jax.numpy as jnp

            from ..entropy.vrans import build_packed_tables, low_memory_mode

            if low_memory_mode():
                dev = None
            else:
                host = build_packed_tables(
                    self.quantized_cdf, self.cdf_length, self.offset,
                    lut=self.decode_lut,
                )
                dev = (
                    {k: jnp.asarray(v) for k, v in host.items()}
                    if host is not None else None
                )
            object.__setattr__(self, "_device_packed", dev)
        return dev

    def device_bytes(self) -> dict:
        """Per-component device-memory footprint (bytes) of the table copies
        this object would upload in the current mode — the decode-table
        memory story for capacity planning."""
        n, stride = self.quantized_cdf.shape
        from ..entropy.vrans import build_compact_tables, low_memory_mode

        base = {
            "cdf": n * stride * 4,
            "sizes": n * 4,
            "offsets": n * 4,
        }
        if build_compact_tables(
            self.quantized_cdf, self.cdf_length, self.offset
        ) is not None:
            # gather-free one-hot coder: split-byte bf16 matrices only
            base["dec_hi_lo"] = 2 * n * (stride + 2) * 2
            base["enc_hi_lo"] = 2 * n * (2 * stride) * 2
        elif low_memory_mode():
            base["cdf_search"] = n * stride * 4
        else:
            base["lut"] = n * (1 << 16) * 4
            base["sf"] = n * (1 << 16) * 4
            base["post"] = n * (1 << 16) * 2
            base["mo"] = n * 4
            base["cdf2"] = n * (stride - 1) * 4
        base["total"] = sum(base.values())
        return base

    def validate(self):
        if self.quantized_cdf.size == 0:
            raise ValueError("Uninitialized CDFs. Run update() first")
        if self.cdf_length.size == 0:
            raise ValueError("Uninitialized CDF lengths. Run update() first")
        if self.offset.size == 0:
            raise ValueError("Uninitialized offsets. Run update() first")


def compress_symbols(symbols: np.ndarray, indexes: np.ndarray, tables: CdfTables,
                     backend: str = "rans"):
    """Encode per-batch-element symbol planes to a list of byte strings.

    symbols/indexes: (batch, ...) int arrays of identical shape.
    ``backend``: host coder stream format — "rans" or "range".
    """
    tables.validate()
    symbols = np.asarray(symbols)
    indexes = np.asarray(indexes)
    if symbols.ndim < 2:
        raise ValueError(
            "Invalid `inputs` size. Expected a tensor with at least 2 dimensions."
        )
    if symbols.shape != indexes.shape:
        raise ValueError("`inputs` and `indexes` should have the same size.")
    batch = symbols.shape[0]
    return coder.encode_batch(
        symbols.reshape(batch, -1),
        indexes.reshape(batch, -1),
        tables.quantized_cdf,
        tables.cdf_length,
        tables.offset,
        backend=backend,
    )


def compress_symbols_interleaved(
    symbols: np.ndarray, indexes: np.ndarray, tables: CdfTables,
    lanes: int = None,
):
    """Encode per-batch-element planes with the on-chip interleaved-lane
    coder (format "tpu"; see ``entropy/vrans.py``)."""
    from ..entropy import vrans

    tables.validate()
    symbols = np.asarray(symbols)
    indexes = np.asarray(indexes)
    if symbols.ndim < 2:
        raise ValueError(
            "Invalid `inputs` size. Expected a tensor with at least 2 dimensions."
        )
    if symbols.shape != indexes.shape:
        raise ValueError("`inputs` and `indexes` should have the same size.")
    batch = symbols.shape[0]
    return vrans.encode_interleaved_batch(
        symbols.reshape(batch, -1), indexes.reshape(batch, -1),
        tables.coding_cdf, tables.cdf_length, tables.offset, lanes,
    )


def decompress_symbols_interleaved(
    strings, indexes: np.ndarray, tables: CdfTables
) -> np.ndarray:
    from ..entropy import vrans

    tables.validate()
    indexes = np.asarray(indexes)
    batch = indexes.shape[0]
    out = vrans.decode_interleaved_batch(
        strings, indexes.reshape(batch, -1),
        tables.coding_cdf, tables.cdf_length, tables.offset,
        lut=tables.coding_lut,
    )
    return out.reshape(indexes.shape)


def decompress_symbols(strings, indexes: np.ndarray, tables: CdfTables,
                       backend: str = "rans") -> np.ndarray:
    """Decode byte strings back to symbols shaped like ``indexes``."""
    tables.validate()
    if not isinstance(strings, (tuple, list)):
        raise ValueError("Invalid `strings` parameter type.")
    indexes = np.asarray(indexes)
    if indexes.ndim < 2:
        raise ValueError(
            "Invalid `indexes` size. Expected a tensor with at least 2 dimensions."
        )
    if len(strings) != indexes.shape[0]:
        raise ValueError("Invalid strings or indexes parameters")
    batch = indexes.shape[0]
    out = coder.decode_batch(
        strings,
        indexes.reshape(batch, -1),
        tables.quantized_cdf,
        tables.cdf_length,
        tables.offset,
        backend=backend,
    )
    return out.reshape(indexes.shape)
