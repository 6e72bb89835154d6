"""Stateful codec wrapper over the functional flax cores.

The reference exposes codecs as stateful ``nn.Module`` objects with
``forward / compress / decompress / update / aux_loss / from_state_dict``
(``models/google.py:56-116``). Here the same surface wraps:

* a flax module (pure network definition),
* a params pytree,
* :class:`~..entropy_models.base.CdfTables` per entropy model, built by
  ``update()`` (host numpy, replicable over a device mesh),
* a cache of jitted device functions keyed by name.

Training code bypasses the wrapper and uses the flax module directly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CompressionModel"]


class CompressionModel:
    """Base class; subclasses set ``net`` (flax module) and implement the
    codec paths."""

    def __init__(self, net, params=None):
        self.net = net
        self.params = params
        self.tables: Dict[str, Any] = {}
        self._jit_cache: Dict[str, Any] = {}
        # "rans": reference-bit-exact single stream per image;
        # "tpu": interleaved-lane on-chip coder (entropy/vrans.py)
        self.stream_format = "rans"
        # transform compute dtype; half() switches to bfloat16
        self._compute_dtype = jnp.float32

    # -- parameter residency ----------------------------------------------
    # ``params`` is a lazy device-resident pytree: the first read after any
    # assignment uploads the whole tree with ONE ``jax.device_put``. Without
    # this, every jitted dispatch re-uploads the full weight set from host
    # numpy (~3 MB for the flagship g_a — ~36 ms on the ~80 MB/s dev
    # tunnel, which round 4 misread as "4-6% transform MFU"; the chip-side
    # g_a is ~11 ms). Host-side consumers (CDF baking, medians) still read
    # through np.asarray; small frequently-read values are cached in
    # ``_host_cache`` so codec calls don't pay a per-call D2H round trip.
    @property
    def params(self):
        if self._params is not None and not self._params_on_device:
            try:
                self._params = jax.device_put(self._params)
            except Exception:  # pragma: no cover - no backend available
                pass
            self._params_on_device = True
        return self._params

    @params.setter
    def params(self, tree):
        self._params = tree
        self._params_on_device = False
        self._host_cache: Dict[str, Any] = {}

    # -- lifecycle ---------------------------------------------------------
    def init(self, key=None, input_shape=(1, 256, 256, 3)):
        """Initialize parameters with random weights."""
        if key is None:
            key = jax.random.key(0)
        x = jnp.zeros(input_shape, jnp.float32)
        variables = self.net.init({"params": key, "noise": jax.random.key(1)}, x)
        self.params = variables["params"]
        return self

    def _apply(self, method, *args, **kwargs):
        return self.net.apply({"params": self.params}, *args, method=method, **kwargs)

    def _jitted(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    # Top-level param subtrees that half() must keep in fp32. AR models pin
    # their coding-path weights here: the encoder derives symbols on device
    # (wavefront) while the "rans" decoder recomputes means/scales on the
    # host, and host-vs-device GEMM bit-equality is only established for
    # fp32 — a bf16 AR path could silently desync the stream.
    _half_keep_fp32: tuple = ()

    def half(self, dtype=jnp.bfloat16):
        """Cast floating-point parameters (and transform compute) to half
        precision. The reference's ``--half`` casts the torch model to fp16
        (``utils/eval_model/__main__.py:174-176``); on TPU the native half
        type is bfloat16. Entropy coding stays integer/fp32-consistent:
        encoder and decoder derive coding params from the same quantized
        latents with the same ops, so streams stay self-consistent; subtrees
        named in ``_half_keep_fp32`` (the AR prediction weights) are kept in
        fp32 so the host and device coding paths stay bit-identical. Call
        ``update()`` BEFORE ``half()`` so CDF tables are built in fp32.
        """
        keep = frozenset(self._half_keep_fp32)

        def cast(path, a):
            if path and getattr(path[0], "key", None) in keep:
                return a
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
                return a.astype(dtype)
            return a

        self.params = jax.tree_util.tree_map_with_path(cast, self.params)
        self._compute_dtype = dtype
        self._jit_cache.clear()
        return self

    # -- reference-surface API --------------------------------------------
    def forward(self, x, training: bool = False, key=None):
        """Training/eval forward: returns {"x_hat", "likelihoods": {...}}."""
        rngs = {"noise": key if key is not None else jax.random.key(0)}
        return self.net.apply(
            {"params": self.params}, jnp.asarray(x), training, rngs=rngs
        )

    def __call__(self, x, training: bool = False, key=None):
        return self.forward(x, training, key)

    def aux_loss(self):
        """Aggregated EntropyBottleneck quantile losses
        (reference ``models/google.py:75-82``)."""
        raise NotImplementedError

    def update(self, force: bool = False) -> bool:
        """Build/refresh the quantized CDF tables."""
        raise NotImplementedError

    def compress(self, x) -> dict:
        raise NotImplementedError

    def decompress(self, strings, shape) -> dict:
        raise NotImplementedError

    # -- convenience -------------------------------------------------------
    @property
    def downsampling_factor(self) -> int:
        return 2**4

    def downsampling_factor_ga(self) -> int:
        """Spatial factor of the analysis transform alone (x -> y)."""
        return 16

    def _cast(self, v) -> jnp.ndarray:
        """Upload + cast to the transform compute dtype (fp32 or half)."""
        return jnp.asarray(v, self._compute_dtype)

    def _require_tables(self, *names):
        for n in names:
            if n not in self.tables:
                raise ValueError("Uninitialized CDFs. Run update() first")

    def _nhwc(self, x) -> jnp.ndarray:
        """Accepts float [0, 1] or uint8 [0, 255] input; uint8 is uploaded
        as-is (4x less host->device traffic) and scaled on device."""
        dt = self._compute_dtype
        if hasattr(x, "dtype") and np.dtype(x.dtype) == np.uint8:
            x = jnp.asarray(x)
            x = x.astype(dt) / np.asarray(255.0, dt)
        else:
            x = jnp.asarray(x, dt)
        if x.ndim != 4:
            raise ValueError("expected (B, H, W, C) input")
        return x
