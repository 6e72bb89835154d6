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

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_train_checkpoint",
    "load_train_checkpoint",
    "sha256_file",
]


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


def save_train_checkpoint(path, state, scheduler=None, epoch: int = 0,
                          key=None, best_loss: float = float("inf"),
                          extra: dict = None):
    """Serialize a full training state: params, BOTH optimizer states, the
    plateau scheduler, epoch, best loss, and the RNG key — everything needed
    for exact resume (reference ``examples/train.py:199-203,331-338``)."""
    import jax

    payload = {
        "params": serialization.to_state_dict(jax.device_get(state.params)),
        "main_opt_state": serialization.to_state_dict(
            jax.device_get(state.main_opt_state)
        ),
        "aux_opt_state": serialization.to_state_dict(
            jax.device_get(state.aux_opt_state)
        ),
        "step": int(state.step),
        "epoch": int(epoch),
        "best_loss": float(best_loss),
        "scheduler": scheduler.state_dict() if scheduler is not None else {},
        "rng_key": (
            np.asarray(jax.random.key_data(key))
            if key is not None else np.zeros(0, np.uint32)
        ),
        "extra": extra or {},
    }
    Path(path).write_bytes(serialization.msgpack_serialize(payload))


def load_train_checkpoint(path, template_state, scheduler=None):
    """Restore a training checkpoint into the shape of ``template_state``
    (a freshly initialized TrainState). Returns
    (state, scheduler, epoch, key, best_loss, extra)."""
    import jax

    from ..training.optim import TrainState

    payload = serialization.msgpack_restore(Path(path).read_bytes())
    state = TrainState(
        params=serialization.from_state_dict(
            template_state.params, payload["params"]
        ),
        main_opt_state=serialization.from_state_dict(
            template_state.main_opt_state, payload["main_opt_state"]
        ),
        aux_opt_state=serialization.from_state_dict(
            template_state.aux_opt_state, payload["aux_opt_state"]
        ),
        step=int(payload["step"]),
    )
    if scheduler is not None and payload.get("scheduler"):
        scheduler.load_state_dict(payload["scheduler"])
    key = None
    if np.size(payload.get("rng_key", ())):
        key = jax.random.wrap_key_data(np.asarray(payload["rng_key"]))
    return (
        state, scheduler, int(payload["epoch"]), key,
        float(payload["best_loss"]), payload.get("extra", {}),
    )


def sha256_file(path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()
