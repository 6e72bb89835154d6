"""Generalized Divisive Normalization.

``y_c = x_c / sqrt(beta_c + sum_j gamma[c, j] * x_j^2)`` (inverse: multiply by
sqrt). The reference implements the channel mixing as a 1x1 conv on ``x**2``
(``compressai/layers/gdn.py:77-92``); in NHWC it is a plain channel matmul,
which XLA tiles straight onto the MXU and fuses with the square/rsqrt.

Parameters are stored in the reference's non-negative reparam space
(sqrt(x + pedestal)) with identical names/shapes (``beta``: (C,), ``gamma``:
(C_out, C_in)) so torch checkpoints import without renaming.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..ops.parametrizers import NonNegativeParametrizer

__all__ = ["GDN", "GDN1"]


class GDN(nn.Module):
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        gamma_reparam = NonNegativeParametrizer()
        beta = self.param(
            "beta", lambda key: beta_reparam.init(jnp.ones((c,), jnp.float32))
        )
        gamma = self.param(
            "gamma",
            lambda key: gamma_reparam.init(
                self.gamma_init * jnp.eye(c, dtype=jnp.float32)
            ),
        )
        beta = beta_reparam(beta)
        gamma = gamma_reparam(gamma)  # (out, in), matching the torch layout

        # norm[..., c] = sum_j x^2[..., j] * gamma[c, j] + beta[c]
        norm = (
            jnp.matmul(
                jnp.square(x), gamma.T, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            + beta
        )
        norm = jnp.sqrt(norm) if self.inverse else lax.rsqrt(norm)
        return x * norm


class GDN1(GDN):
    """Simplified GDN: |x| mixing and no sqrt (reference ``gdn.py:108-121``)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        gamma_reparam = NonNegativeParametrizer()
        beta = self.param(
            "beta", lambda key: beta_reparam.init(jnp.ones((c,), jnp.float32))
        )
        gamma = self.param(
            "gamma",
            lambda key: gamma_reparam.init(
                self.gamma_init * jnp.eye(c, dtype=jnp.float32)
            ),
        )
        beta = beta_reparam(beta)
        gamma = gamma_reparam(gamma)

        norm = (
            jnp.matmul(
                jnp.abs(x), gamma.T, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            + beta
        )
        if not self.inverse:
            norm = 1.0 / norm
        return x * norm
