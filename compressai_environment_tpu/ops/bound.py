"""Bound operators with straight-through-style gradients.

``lower_bound`` computes ``maximum(x, bound)`` with a custom VJP: the gradient
passes through iff ``x >= bound`` or the gradient pushes ``x`` upward
(``g < 0``) — the reference semantics at ``compressai/ops/bound_ops.py:40-42``.
Used for likelihood floors and the Gaussian scale floor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["lower_bound", "LowerBound"]


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    gx = jnp.where(pass_through, g, 0.0)
    return gx, None


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


class LowerBound:
    """Callable wrapper holding a fixed bound (reference ``LowerBound`` module)."""

    def __init__(self, bound: float):
        self.bound = float(bound)

    def __call__(self, x):
        return lower_bound(x, jnp.asarray(self.bound, dtype=x.dtype))
