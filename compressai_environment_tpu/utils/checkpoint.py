"""Native checkpoint serialization.

A checkpoint is a single msgpack file holding the params pytree, baked CDF
tables, the Gaussian scale table, and architecture metadata. The reference's
dynamic-buffer-resize dance (``models/utils.py:62-125``) disappears: tables
are plain arrays in the tree.

Torch ``.pth.tar`` checkpoints remain loadable through
``zoo.torch_import.load_state_dict``.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "sha256_file"]


def _tables_to_tree(tables):
    return {
        name: {
            "quantized_cdf": t.quantized_cdf,
            "cdf_length": t.cdf_length,
            "offset": t.offset,
        }
        for name, t in tables.items()
    }


def _tables_from_tree(tree):
    from ..entropy_models import CdfTables

    return {
        name: CdfTables(d["quantized_cdf"], d["cdf_length"], d["offset"])
        for name, d in tree.items()
    }


def save_checkpoint(model, path, architecture: str = None, extra: dict = None):
    """Serialize a wrapper CompressionModel to ``path``."""
    state = {
        "params": serialization.to_state_dict(model.params),
        "tables": _tables_to_tree(model.tables),
        "scale_table": (
            np.asarray(model.scale_table)
            if getattr(model, "scale_table", None) is not None
            else np.zeros((0,), np.float32)
        ),
        "meta": {
            "architecture": architecture or "",
            **(extra or {}),
        },
    }
    blob = serialization.msgpack_serialize(state)
    Path(path).write_bytes(blob)
    return path


def load_checkpoint(path):
    """Returns (params, tables, scale_table, meta)."""
    state = serialization.msgpack_restore(Path(path).read_bytes())
    tables = _tables_from_tree(state.get("tables", {}))
    scale_table = state.get("scale_table")
    if scale_table is not None and np.size(scale_table) == 0:
        scale_table = None
    return state["params"], tables, scale_table, state.get("meta", {})


def restore_into(model, path):
    params, tables, scale_table, meta = load_checkpoint(path)
    model.params = params
    model.tables = tables
    if scale_table is not None:
        model.scale_table = scale_table
    model._jit_cache.clear()
    return model


def sha256_file(path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()
