"""Device-mesh utilities: DP/TP sharded training and data-parallel codec runs.

The reference's only parallelism is single-host ``nn.DataParallel``
(``examples/train.py:88-95``). Here scale-out is mesh-native:

* a ``Mesh`` over ("dp", "tp"): batch sharded over ``dp``; the widest conv
  kernels' output-channel dim sharded over ``tp`` (XLA SPMD inserts the
  all-gathers/psums over ICI),
* training steps jitted with explicit ``NamedSharding`` in/out specs —
  gradient reduction is an XLA ``psum`` over ``dp``,
* codec runs shard images over all devices; symbols land on host in batch
  order, so the per-image bitstreams are gathered deterministically
  regardless of mesh shape,
* multi-host: call ``jax.distributed.initialize()`` before building the mesh;
  ``dp`` spans hosts over DCN while ``tp`` stays intra-slice on ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "make_sharded_train_step",
    "shard_batch",
]

# conv output channels >= this are worth sharding over tp
_TP_MIN_FEATURES = 64


def make_mesh(n_devices: Optional[int] = None, tp: int = 1) -> Mesh:
    """Build a ("dp", "tp") mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if n % tp != 0:
        raise ValueError(f"n_devices={n} not divisible by tp={tp}")
    arr = mesh_utils.create_device_mesh((n // tp, tp), devices=devices[:n])
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel layout: shard wide conv kernels/biases over tp.

    Kernels are HWIO; the output-channel (last) dim is sharded when it is
    wide enough and divisible by the tp extent. Everything else replicates.
    """
    tp = mesh.shape["tp"]

    def rule(x):
        shape = np.shape(x)
        if (
            tp > 1
            and len(shape) == 4
            and shape[-1] >= _TP_MIN_FEATURES
            and shape[-1] % tp == 0
        ):
            return NamedSharding(mesh, P(None, None, None, "tp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_batch(x, mesh: Mesh):
    """Place a host array onto the mesh, batch over dp.

    Multi-process (``jax.distributed``): ``x`` is this process's LOCAL
    slice of the global batch; the global array is assembled from the
    per-process shards without any cross-host data movement."""
    x = np.asarray(x)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(batch_sharding(mesh), x)
    return jax.device_put(x, batch_sharding(mesh))


def make_sharded_train_step(net, mesh: Mesh, txs, lmbda: float, loss_fn):
    """jit the two-chain train step with explicit mesh shardings.

    Returns ``step(state, batch, key) -> (state, losses)``; the batch must be
    divisible by the dp extent.
    """
    from ..training.optim import train_step

    def _step(state, batch, key):
        return train_step(net, state, txs, batch, key, lmbda, loss_fn)

    jitted = jax.jit(_step)

    def place_state(state):
        """Lay out params (and mirrored optimizer moments) on the mesh."""
        p_shard = param_shardings(state.params, mesh)

        def put_like(tree):
            def put(x):
                # optimizer pytrees mirror the params; shard arrays whose
                # shape matches a sharded param rule, replicate the rest
                if hasattr(x, "shape") and np.ndim(x) == 4:
                    return jax.device_put(
                        x, NamedSharding(mesh, P(None, None, None, "tp"))
                        if _tp_shardable(np.shape(x), mesh.shape["tp"])
                        else replicated(mesh)
                    )
                if hasattr(x, "shape"):
                    return jax.device_put(x, replicated(mesh))
                return x

            return jax.tree_util.tree_map(put, tree)

        params = jax.tree_util.tree_map(jax.device_put, state.params, p_shard)
        return state._replace(
            params=params,
            main_opt_state=put_like(state.main_opt_state),
            aux_opt_state=put_like(state.aux_opt_state),
        )

    def step(state, batch, key):
        return jitted(state, shard_batch(batch, mesh), key)

    step.place_state = place_state
    return step


def _tp_shardable(shape, tp: int) -> bool:
    return (
        tp > 1
        and len(shape) == 4
        and shape[-1] >= _TP_MIN_FEATURES
        and shape[-1] % tp == 0
    )


def compress_data_parallel(model, x, mesh: Mesh):
    """Data-parallel codec run: shard the image batch over every device in
    the mesh and run the model's compress path. With ``stream_format="tpu"``
    the transforms AND the interleaved-rANS scan run SPMD across the mesh
    (the lane axis of the scan carries the batch sharding); per-image
    bitstreams come back in batch order, so the gathered list is
    deterministic for any mesh shape."""
    xs = shard_batch(x, mesh)
    return model.compress(xs)


def decompress_data_parallel(model, strings, shape, mesh: Mesh):
    """Counterpart of :func:`compress_data_parallel`: the per-image decode
    layout (indexes, lane schedule) is placed batch-sharded over ``dp``, so
    XLA partitions the decode scan, symbol recovery and the synthesis
    transform across the mesh; decoded images come back sharded over dp
    (asserted by ``__graft_entry__.dryrun_multichip``)."""
    return model.decompress(strings, shape, sharding=batch_sharding(mesh))
