"""Quantization primitives.

``ste_round``: straight-through round (reference ``compressai/ops/ops.py:35-49``,
``models/utils.py:149-152``). ``quantize``: the three reference quantization
modes (``entropy_models.py:155-180``) as a pure function — ``noise`` adds
U(-1/2, 1/2), ``dequantize`` rounds about ``means``, ``symbols`` returns
int32 residual symbols.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ste_round", "quantize_ste", "quantize", "dequantize"]


@jax.custom_vjp
def ste_round(x):
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_fwd, _ste_bwd)

# Reference alias (models/utils.py:149)
quantize_ste = ste_round


def quantize(inputs, mode: str, means=None, *, key=None):
    """Quantize ``inputs`` in one of the reference modes.

    Args:
        inputs: latent tensor.
        mode: ``"noise"`` | ``"dequantize"`` | ``"symbols"``.
        means: optional mean tensor (broadcastable to ``inputs``).
        key: PRNG key, required for ``"noise"``.
    """
    if mode == "noise":
        if key is None:
            raise ValueError("mode='noise' requires a PRNG key")
        noise = jax.random.uniform(
            key, inputs.shape, dtype=inputs.dtype, minval=-0.5, maxval=0.5
        )
        return inputs + noise

    outputs = inputs
    if means is not None:
        outputs = outputs - means
    outputs = jnp.round(outputs)

    if mode == "dequantize":
        if means is not None:
            outputs = outputs + means
        return outputs

    if mode != "symbols":
        raise ValueError(f'Invalid quantization mode: "{mode}"')
    return outputs.astype(jnp.int32)


def dequantize(inputs, means=None, dtype=jnp.float32):
    """Map integer symbols back to latent values (reference
    ``EntropyModel.dequantize``, ``entropy_models.py:188-197``)."""
    if means is not None:
        return inputs.astype(means.dtype) + means
    return inputs.astype(dtype)
