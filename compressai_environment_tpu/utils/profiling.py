"""Tracing / profiling support.

The reference only has ad-hoc wall-clock spans (``eval_model:111-117``).
Here the same JSON timing fields are kept for comparability, plus proper
device-level tracing: wrap any region in :func:`trace` to capture a
TensorBoard-viewable ``jax.profiler`` trace (XLA kernel timeline, HBM
transfers, host callbacks).
"""

from __future__ import annotations

import contextlib

__all__ = ["trace"]


@contextlib.contextmanager
def trace(log_dir=None):
    """Context manager: profiles the enclosed region into ``log_dir`` when
    given, no-op otherwise.

    Example:
        with trace("/tmp/jax-trace"):
            out = model.compress(x)
    """
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield
