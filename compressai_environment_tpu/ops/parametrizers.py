"""Non-negative reparametrization for GDN's beta/gamma.

Stores ``sqrt(x + pedestal)`` and squares on the forward pass with a lower
bound, keeping parameters >= ``minimum`` stably under gradient descent
(reference ``compressai/ops/parametrizers.py:38-64``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .bound import lower_bound

__all__ = ["NonNegativeParametrizer"]


class NonNegativeParametrizer:
    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2**-18):
        self.minimum = float(minimum)
        self.reparam_offset = float(reparam_offset)
        self.pedestal = self.reparam_offset**2
        self._bound = (self.minimum + self.reparam_offset**2) ** 0.5

    def init(self, x):
        """Map an initial value into reparametrized space."""
        return jnp.sqrt(jnp.maximum(x + self.pedestal, self.pedestal))

    def __call__(self, x):
        out = lower_bound(x, jnp.asarray(self._bound, dtype=x.dtype))
        return out * out - self.pedestal
