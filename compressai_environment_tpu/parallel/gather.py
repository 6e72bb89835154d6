"""Deterministic multi-host gathering of variable-length bitstreams.

SURVEY §2.3: bitstreams are variable length, so cross-host collection uses
fixed-size padded buffers + a length vector, an all-gather over hosts, and a
host-side trim — gathered in (process, local-index) order so every host sees
the same deterministic list regardless of mesh shape.

Single-process runs return the input unchanged (the common case in tests and
single-host benchmarks); the padded-buffer round trip itself is covered by
unit tests.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

__all__ = ["pack_strings", "unpack_strings", "gather_bitstreams"]


def pack_strings(strings: Sequence[bytes], cap: int = None):
    """Pack a list of byte strings into (buffer (n, cap) uint8, lengths (n,))."""
    n = len(strings)
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    if cap is None:
        cap = int(lengths.max()) if n else 0
    if n and int(lengths.max()) > cap:
        raise ValueError(f"string of {lengths.max()} bytes exceeds cap {cap}")
    buf = np.zeros((n, cap), dtype=np.uint8)
    for i, s in enumerate(strings):
        buf[i, : len(s)] = np.frombuffer(s, np.uint8)
    return buf, lengths


def unpack_strings(buf: np.ndarray, lengths: np.ndarray) -> List[bytes]:
    return [buf[i, : int(lengths[i])].tobytes() for i in range(buf.shape[0])]


def gather_bitstreams(local_strings: Sequence[bytes]) -> List[bytes]:
    """All-gather per-process bitstream lists across hosts.

    Every process must call with the same number of strings; the result is
    ordered by (process_index, local index) on every host.
    """
    import jax

    if jax.process_count() == 1:
        return list(local_strings)

    from jax.experimental import multihost_utils

    buf, lengths = pack_strings(local_strings)
    # cap must agree across processes: take the global max
    local_max = np.array([buf.shape[1]], dtype=np.int64)
    global_max = int(
        np.max(multihost_utils.process_allgather(local_max))
    )
    if buf.shape[1] < global_max:
        buf = np.pad(buf, ((0, 0), (0, global_max - buf.shape[1])))

    all_bufs = multihost_utils.process_allgather(buf)  # (P, n, cap)
    all_lens = multihost_utils.process_allgather(lengths)  # (P, n)
    out: List[bytes] = []
    for p in range(all_bufs.shape[0]):
        out.extend(unpack_strings(np.asarray(all_bufs[p]), np.asarray(all_lens[p])))
    return out
