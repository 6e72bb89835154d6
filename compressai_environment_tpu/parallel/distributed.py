"""Multi-host wiring: ``jax.distributed`` initialization from CLI flags and
deterministic work sharding across processes.

The reference has no distributed runtime (SURVEY §2.3); here every process
of a multi-host run calls :func:`maybe_initialize` once, takes its slice of
the global work list with :func:`shard_work`, and merges per-process results
with :func:`parallel.gather.gather_bitstreams` (bitstreams) or
:func:`allgather_records` (fixed-size metric vectors). All orderings are by
(global index), so every process reconstructs the same result list
regardless of process count.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Sequence, Tuple

import numpy as np

__all__ = [
    "add_distributed_args",
    "maybe_initialize",
    "shard_work",
    "allgather_records",
]


def add_distributed_args(parser: argparse.ArgumentParser) -> None:
    """Add the multi-process flags shared by the distributed-capable CLIs."""
    g = parser.add_argument_group("distributed")
    g.add_argument(
        "--distributed",
        action="store_true",
        help="join a jax.distributed cluster (multi-host/multi-process run)",
    )
    g.add_argument(
        "--coordinator",
        default=os.environ.get("JAX_COORDINATOR_ADDRESS", "localhost:9901"),
        help="coordinator address host:port (default: %(default)s)",
    )
    g.add_argument(
        "--num-processes",
        type=int,
        default=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        help="total process count",
    )
    g.add_argument(
        "--process-id",
        type=int,
        default=int(os.environ.get("JAX_PROCESS_ID", "0")),
        help="this process's id in [0, num-processes)",
    )


def maybe_initialize(args) -> Tuple[int, int]:
    """Initialize ``jax.distributed`` when ``--distributed`` was passed.

    Returns (process_index, process_count). On TPU pods with automatic
    coordinator discovery the flags may be omitted entirely —
    ``jax.distributed.initialize()`` resolves them from the environment.
    """
    import jax

    if getattr(args, "distributed", False):
        kwargs = {}
        if args.num_processes > 1 or "JAX_COORDINATOR_ADDRESS" not in os.environ:
            kwargs = dict(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def shard_work(items: Sequence, process_index: int = None,
               process_count: int = None) -> Tuple[List, List[int]]:
    """Round-robin shard of a global work list.

    Returns (local_items, global_indices). Every process gets the same
    number of items (the tail is padded by wrapping around, flagged with a
    repeated global index) so fixed-size collectives line up; consumers
    dedupe by global index after gathering.
    """
    import jax

    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if n == 1:
        return list(items), list(range(len(items)))
    idx = list(range(p, len(items), n))
    per = -(-len(items) // n)
    while len(idx) < per:  # wrap-around padding keeps shard sizes equal
        idx.append(idx[-1] if idx else p % len(items))
    return [items[i] for i in idx], idx


def allgather_records(local: np.ndarray, global_indices: Sequence[int],
                      total: int) -> np.ndarray:
    """All-gather per-item records across processes into global order.

    ``local``: (n_local, k) float array; ``global_indices``: the item ids
    from :func:`shard_work`. Returns (total, k), identical on all hosts;
    wrap-around padding rows are overwritten by their true owners (every
    global index is produced by exactly one non-padded slot, and padded
    slots repeat an index owned by the same process with the same value).
    """
    import jax

    local = np.asarray(local, np.float64)
    idx = np.asarray(list(global_indices), np.int64)
    if jax.process_count() == 1:
        out = np.zeros((total, local.shape[1]), np.float64)
        out[idx] = local
        return out

    from jax.experimental import multihost_utils

    all_rec = multihost_utils.process_allgather(local)  # (P, per, k)
    all_idx = multihost_utils.process_allgather(idx)  # (P, per)
    out = np.zeros((total, local.shape[1]), np.float64)
    for p in range(all_rec.shape[0]):
        out[np.asarray(all_idx[p])] = np.asarray(all_rec[p])
    return out
