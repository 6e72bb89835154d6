"""PyTorch checkpoint ingestion: CompressAI state dicts -> flax params + CDF tables.

Because this framework names every flax child after the corresponding torch
attribute/index, a torch key like ``g_a.4.weight`` maps mechanically to the
flax path ``g_a/4``; the leaf kind is resolved against the target model's
initialized parameter template:

* conv ``weight`` (template leaf ``kernel``): OIHW -> HWIO transpose,
* transposed-conv ``weight`` (template leaf ``kernel_t``): IOHW -> HWIO with
  spatial flip (the layout our ``Deconv`` consumes natively),
* everything else (biases, GDN beta/gamma, EB ``_matrixN``/``quantiles``):
  copied as-is.

Baked codec state is extracted rather than recomputed, so pretrained zoo
bitstreams stay bit-exact: ``*._quantized_cdf``/``_offset``/``_cdf_length``
become :class:`CdfTables` and ``gaussian_conditional.scale_table`` is kept.

Legacy key migration mirrors reference ``zoo/pretrained.py:36-58``
(``module.`` strip, ``downsample``->``skip``, ParameterList renames).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

from ..entropy_models import CdfTables

__all__ = [
    "rename_key",
    "load_pretrained",
    "state_dict_to_params",
    "params_to_state_dict",
    "load_state_dict",
]

_BUFFER_LEAVES = ("_quantized_cdf", "_offset", "_cdf_length", "scale_table", "target")

# Constant (non-learned) torch buffers: LowerBound.bound and
# NonNegativeParametrizer.pedestal are architecture constants re-derived by
# our modules, so checkpoints may or may not carry them.
_CONSTANT_LEAVES = ("bound", "pedestal", "scale_bound")


def rename_key(key: str) -> str:
    """Legacy checkpoint key migration (reference ``zoo/pretrained.py:36-58``)."""
    if key.startswith("module."):
        key = key[7:]
    if key.startswith("h_s."):
        pass  # current naming
    if ".downsample." in key:
        key = key.replace(".downsample.", ".skip.")
    # ParameterList "_biases.N" -> "_biasN" etc.
    singular = {"_biases": "_bias", "_matrices": "_matrix", "_factors": "_factor"}
    key = re.sub(
        r"(_biases|_matrices|_factors)\.(\d+)",
        lambda m: f"{singular[m.group(1)]}{m.group(2)}",
        key,
    )
    return key


def load_pretrained(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Apply key migration over a whole state dict."""
    return {rename_key(k): v for k, v in state_dict.items()}


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _tree_get(tree, path):
    node = tree
    for seg in path:
        if not isinstance(node, Mapping) or seg not in node:
            return None
        node = node[seg]
    return node


def _tree_set(tree, path, value):
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
    node[path[-1]] = value


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def state_dict_to_params(state_dict: Mapping[str, Any], template) -> Dict[str, Any]:
    """Convert a (migrated) torch state dict into a flax params tree matching
    ``template`` (an initialized params pytree used for structure/shapes)."""
    params: Dict[str, Any] = {}
    unused = []

    for key, value in state_dict.items():
        segs = key.split(".")
        leaf = segs[-1]
        if leaf in _BUFFER_LEAVES or leaf in _CONSTANT_LEAVES or leaf == "mask":
            continue
        arr = _to_numpy(value)
        path = tuple(segs[:-1])

        if leaf == "weight":
            t_kernel = _tree_get(template, path + ("kernel",))
            t_kernel_t = _tree_get(template, path + ("kernel_t",))
            if t_kernel is not None:
                conv = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
                if conv.shape != t_kernel.shape:
                    raise ValueError(
                        f"{key}: converted shape {conv.shape} != template {t_kernel.shape}"
                    )
                _tree_set(params, path + ("kernel",), conv.astype(np.float32))
            elif t_kernel_t is not None:
                dec = np.transpose(arr[:, :, ::-1, ::-1], (2, 3, 0, 1))  # IOHW flip -> HWIO
                dec = np.ascontiguousarray(dec)
                if dec.shape != t_kernel_t.shape:
                    raise ValueError(
                        f"{key}: converted shape {dec.shape} != template {t_kernel_t.shape}"
                    )
                _tree_set(params, path + ("kernel_t",), dec.astype(np.float32))
            else:
                unused.append(key)
            continue

        t_leaf = _tree_get(template, path + (leaf,))
        if t_leaf is None:
            unused.append(key)
            continue
        if arr.shape != np.shape(t_leaf):
            raise ValueError(
                f"{key}: shape {arr.shape} != template {np.shape(t_leaf)}"
            )
        _tree_set(params, path + (leaf,), arr.astype(np.float32))

    # every template leaf must be covered
    missing = [
        "/".join(p) for p, _ in _tree_paths(template) if _tree_get(params, p) is None
    ]
    if missing:
        raise ValueError(f"Missing parameters in state dict: {missing[:10]}")
    if unused:
        raise ValueError(f"Unexpected state-dict keys: {unused[:10]}")
    return params


def params_to_state_dict(params, template_sd, tables=None) -> Dict[str, Any]:
    """Inverse of :func:`state_dict_to_params`: export a flax params tree
    (+ optional baked ``CdfTables``) into a torch state dict shaped like
    ``template_sd`` (a reference module's ``state_dict()``; its constant
    buffers — pedestals, bounds, targets — are kept as-is).

    Used to run OUR trained checkpoints through the reference
    implementation for cross-ecosystem metric/bitstream equality checks.
    """
    import torch

    sd = {k: v.clone() if hasattr(v, "clone") else v
          for k, v in template_sd.items()}

    for path, leaf in _tree_paths(params):
        arr = np.asarray(leaf, np.float32)
        name = path[-1]
        if name == "kernel":  # HWIO -> OIHW
            key = ".".join(path[:-1] + ("weight",))
            val = np.transpose(arr, (3, 2, 0, 1))
        elif name == "kernel_t":  # HWIO(flipped IOHW) -> IOHW
            key = ".".join(path[:-1] + ("weight",))
            val = np.ascontiguousarray(
                np.transpose(arr, (2, 3, 0, 1))[:, :, ::-1, ::-1]
            )
        else:
            key = ".".join(path)
            val = arr
        if key not in sd:
            raise KeyError(f"exported param {key} not in reference state dict")
        if tuple(sd[key].shape) != val.shape:
            raise ValueError(
                f"{key}: exported shape {val.shape} != reference {tuple(sd[key].shape)}"
            )
        sd[key] = torch.from_numpy(np.ascontiguousarray(val))

    if tables is not None:
        for prefix, t in tables.items():
            sd[f"{prefix}._quantized_cdf"] = torch.from_numpy(
                np.asarray(t.quantized_cdf, np.int32)
            )
            sd[f"{prefix}._cdf_length"] = torch.from_numpy(
                np.asarray(t.cdf_length, np.int32).reshape(-1)
            )
            sd[f"{prefix}._offset"] = torch.from_numpy(
                np.asarray(t.offset, np.int32).reshape(-1)
            )
    return sd


def _extract_tables(state_dict, prefix: str) -> CdfTables | None:
    try:
        cdf = _to_numpy(state_dict[f"{prefix}._quantized_cdf"])
        length = _to_numpy(state_dict[f"{prefix}._cdf_length"])
        offset = _to_numpy(state_dict[f"{prefix}._offset"])
    except KeyError:
        return None
    if cdf.size == 0:
        return None
    return CdfTables(cdf, length, offset)


def load_state_dict_video(model, state_dict) -> None:
    """SSF variant: three sub-hyperpriors, each with its own baked tables
    (reference ``models/video/google.py:437-479``)."""
    state_dict = load_pretrained(state_dict)
    if model.params is None:
        model.init()
    model.params = state_dict_to_params(state_dict, model.params)
    model._jit_cache.clear()

    for branch in ("img", "res", "motion"):
        gc = _extract_tables(state_dict, f"{branch}_hyperprior.gaussian_conditional")
        eb = _extract_tables(state_dict, f"{branch}_hyperprior.entropy_bottleneck")
        if gc is not None:
            model.tables[f"{branch}_y"] = gc
        if eb is not None:
            model.tables[f"{branch}_z"] = eb
        key = f"{branch}_hyperprior.gaussian_conditional.scale_table"
        if key in state_dict:
            st = _to_numpy(state_dict[key])
            if st.size:
                model.scale_table = st.astype(np.float32)


def load_state_dict(model, state_dict) -> None:
    """Populate a wrapper :class:`CompressionModel` from a torch state dict:
    params, baked CDF tables, and the Gaussian scale table if present."""
    state_dict = load_pretrained(state_dict)
    if model.params is None:
        model.init()
    model.params = state_dict_to_params(state_dict, model.params)
    model._jit_cache.clear()

    gc_tables = _extract_tables(state_dict, "gaussian_conditional")
    eb_tables = _extract_tables(state_dict, "entropy_bottleneck")
    if "gaussian_conditional.scale_table" in state_dict:
        st = _to_numpy(state_dict["gaussian_conditional.scale_table"])
        if st.size:
            model.scale_table = st.astype(np.float32)
    if gc_tables is not None:
        model.tables["y"] = gc_tables
        if eb_tables is not None:
            model.tables["z"] = eb_tables
    elif eb_tables is not None:
        # factorized prior: the bottleneck codes y itself
        model.tables["y"] = eb_tables
