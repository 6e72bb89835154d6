"""Two-chain optimizer setup (reference ``examples/train.py:98-129``):
the main optimizer covers every parameter except the entropy-bottleneck
``quantiles``; the aux optimizer covers only the quantiles. The two masks are
disjoint and exhaustive by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import optax

__all__ = ["make_optimizers", "TrainState", "train_step"]


def _is_quantiles(path) -> bool:
    return any(getattr(k, "key", None) == "quantiles" for k in path)


def quantiles_mask(params, invert: bool = False):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_quantiles(path) ^ invert, params
    )


def make_optimizers(
    params,
    learning_rate: float = 1e-4,
    aux_learning_rate: float = 1e-3,
    max_grad_norm: float = 1.0,
):
    """Returns (main_tx, aux_tx) optax transforms with disjoint masks."""
    main = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(learning_rate),
    )
    aux = optax.adam(aux_learning_rate)
    main_masked = optax.masked(main, quantiles_mask(params, invert=True))
    aux_masked = optax.masked(aux, quantiles_mask(params, invert=False))
    return main_masked, aux_masked


class TrainState(NamedTuple):
    params: dict
    main_opt_state: object
    aux_opt_state: object
    step: int


def init_train_state(params, learning_rate=1e-4, aux_learning_rate=1e-3,
                     max_grad_norm=1.0) -> tuple:
    main_tx, aux_tx = make_optimizers(
        params, learning_rate, aux_learning_rate, max_grad_norm
    )
    state = TrainState(
        params=params,
        main_opt_state=main_tx.init(params),
        aux_opt_state=aux_tx.init(params),
        step=0,
    )
    return state, (main_tx, aux_tx)


def train_step(net, state: TrainState, txs, batch, key, lmbda: float,
               loss_fn):
    """One optimization step: RD loss backward + main update, then aux
    (quantile) loss backward + aux update — mirroring the reference's two
    sequential backward passes (``examples/train.py:132-165``)."""
    main_tx, aux_tx = txs

    def rd_loss(params):
        out = net.apply({"params": params}, batch, True, rngs={"noise": key})
        losses = loss_fn(out, batch, lmbda)
        return losses["loss"], losses

    (_, losses), grads = jax.value_and_grad(rd_loss, has_aux=True)(state.params)
    updates, main_opt_state = main_tx.update(grads, state.main_opt_state, state.params)
    params = optax.apply_updates(state.params, updates)

    def aux_loss(params):
        return net.apply({"params": params}, method=type(net).eb_aux_loss)

    aux_val, aux_grads = jax.value_and_grad(aux_loss)(params)
    aux_updates, aux_opt_state = aux_tx.update(aux_grads, state.aux_opt_state, params)
    params = optax.apply_updates(params, aux_updates)

    new_state = TrainState(params, main_opt_state, aux_opt_state, state.step + 1)
    losses = dict(losses)
    losses["aux_loss"] = aux_val
    return new_state, losses
