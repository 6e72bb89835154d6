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
    """Returns (main_tx, aux_tx) optax transforms with disjoint masks.

    The main learning rate is injected as a dynamic hyperparameter so a
    plateau scheduler can change it between epochs without rebuilding the
    optimizer (reference pairs Adam with ReduceLROnPlateau,
    ``examples/train.py:327``)."""

    def _main(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adam(learning_rate),
        )

    main = optax.inject_hyperparams(_main)(learning_rate=learning_rate)
    aux = optax.adam(aux_learning_rate)
    main_masked = optax.masked(main, quantiles_mask(params, invert=True))
    aux_masked = optax.masked(aux, quantiles_mask(params, invert=False))
    return main_masked, aux_masked


def set_learning_rate(opt_state, lr):
    """Return ``opt_state`` with the injected main learning rate replaced.

    Works through ``optax.masked`` wrapping; no-op on states without an
    ``InjectHyperparamsState`` inside."""
    import jax.numpy as jnp

    if isinstance(opt_state, optax.MaskedState):
        return optax.MaskedState(
            inner_state=set_learning_rate(opt_state.inner_state, lr)
        )
    # InjectHyperparamsState / InjectStatefulHyperparamsState (optax>=0.2.3)
    if hasattr(opt_state, "hyperparams") and hasattr(opt_state, "_replace"):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state._replace(hyperparams=hp)
    return opt_state


def get_learning_rate(opt_state):
    """Current injected main learning rate, or None."""
    if isinstance(opt_state, optax.MaskedState):
        return get_learning_rate(opt_state.inner_state)
    if hasattr(opt_state, "hyperparams"):
        return float(opt_state.hyperparams["learning_rate"])
    return None


class PlateauScheduler:
    """ReduceLROnPlateau with torch semantics (mode="min", relative
    threshold 1e-4, cooldown 0) — the reference's scheduler
    (``examples/train.py:327``, stepped on the epoch eval loss at ``:330``).

    Host-side and stateless w.r.t. the optimizer: ``step(loss)`` returns the
    (possibly reduced) learning rate; callers pass it through
    :func:`set_learning_rate`. ``state_dict``/``load_state_dict`` give exact
    checkpoint resume."""

    def __init__(self, lr, factor=0.1, patience=10, threshold=1e-4,
                 min_lr=0.0):
        self.lr = float(lr)
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.min_lr = float(min_lr)
        self.best = float("inf")
        self.num_bad_epochs = 0

    def _is_better(self, loss) -> bool:
        # torch "rel" threshold: loss < best * (1 - threshold)
        return loss < self.best * (1.0 - self.threshold)

    def step(self, loss) -> float:
        loss = float(loss)
        if self._is_better(loss):
            self.best = loss
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {
            "lr": self.lr, "factor": self.factor, "patience": self.patience,
            "threshold": self.threshold, "min_lr": self.min_lr,
            "best": self.best, "num_bad_epochs": self.num_bad_epochs,
        }

    def load_state_dict(self, d) -> "PlateauScheduler":
        for k, v in d.items():
            setattr(self, k, type(getattr(self, k))(v))
        return self


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


def eval_step(net, params, batch, lmbda: float, loss_fn):
    """Deterministic held-out loss (reference ``test_epoch``,
    ``examples/train.py:168-196``): eval-mode forward (round-to-median
    quantization instead of additive noise) + RD loss + aux loss."""
    out = net.apply({"params": params}, batch, False)
    losses = dict(loss_fn(out, batch, lmbda))
    losses["aux_loss"] = net.apply(
        {"params": params}, method=type(net).eb_aux_loss
    )
    return losses
