"""Pallas TPU kernel for the interleaved-lane rANS encoder.

The encoder's inner loop is pure elementwise arithmetic over the lane vector
(no gathers — per-position (start, freq) are precomputed into VMEM-resident
arrays), which maps cleanly onto a Pallas kernel: the grid tiles the lane
axis, each program keeps its lane block's coder state in registers/VMEM and
walks t = T-1..0 in a fori_loop, writing the dense emission matrix in place.
This removes the XLA scan's per-step loop overhead.

The decoder intentionally stays a `lax.scan` (see ``vrans._decode_scan``):
its CDF inversion is a per-lane gather from a (rows, 65536) LUT, and Mosaic
has no vector-gather primitive — XLA's native gather lowering is the right
tool there (pallas_guide: "Memory Access" supports only slices).

Used opportunistically by ``vrans`` on TPU backends; the lax.scan path is
the portable reference and the two are verified bit-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["encode_scan_pallas", "pallas_available"]

_LANE_BLOCK = 128


def _divmod_u32_u16(x, freq):
    """4-leg base-256 long division (as vrans._divmod_u32_u16) with the legs
    carried in int32 — every intermediate < 2^24, and Mosaic supports
    int32<->f32 casts but not uint32->f32."""
    f_i = freq.astype(jnp.int32)
    f_f32 = f_i.astype(jnp.float32)
    q = jnp.zeros(x.shape, jnp.int32)
    r = jnp.zeros(x.shape, jnp.int32)
    for k in (3, 2, 1, 0):
        d = ((x >> np.uint32(8 * k)) & np.uint32(0xFF)).astype(jnp.int32)
        r = (r << np.int32(8)) | d
        ql = (r.astype(jnp.float32) / f_f32).astype(jnp.int32)
        rem = r - ql * f_i
        ql = ql + (rem >= f_i).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        r = r - ql * f_i
        q = (q << np.int32(8)) | ql
    return q.astype(jnp.uint32), r.astype(jnp.uint32)


def _encode_kernel(starts_ref, freqs_ref, words_ref, valid_ref, state_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    T = starts_ref.shape[0]
    lanes = starts_ref.shape[1]
    mask16 = np.uint32(0xFFFF)
    L = np.uint32(1 << 16)

    def body(i, x):
        t = T - 1 - i
        start = starts_ref[t, :][None]
        freq = freqs_ref[t, :][None]
        emit = (x >> np.uint32(16)) >= freq
        word = x & mask16
        x = jnp.where(emit, x >> np.uint32(16), x)
        q, r = _divmod_u32_u16(x, freq)
        x = (q << np.uint32(16)) + r + start
        words_ref[t, :] = word[0]
        valid_ref[t, :] = emit.astype(jnp.uint32)[0]
        return x

    x0 = jnp.full((1, lanes), L, jnp.uint32)
    x = jax.lax.fori_loop(0, T, body, x0)
    state_ref[0, :] = x[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_scan_pallas(starts, freqs, interpret: bool = False):
    """Drop-in replacement for ``vrans._encode_scan``: returns
    (words (T, L) uint32, valid (T, L) uint32-as-bool, state (L,))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, lanes = starts.shape
    blk = min(_LANE_BLOCK, lanes)
    if lanes % blk:
        raise ValueError(f"lanes {lanes} not divisible by block {blk}")
    grid = (lanes // blk,)

    words, valid, state = pl.pallas_call(
        _encode_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((T, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((1, lanes), jnp.uint32),
        ],
        interpret=interpret,
    )(starts, freqs)
    return words, valid.astype(bool), state[0]


_available_cache = {}


def pallas_available() -> bool:
    """Probe whether the Pallas encode kernel compiles and matches the scan
    on this backend (cached)."""
    backend = jax.default_backend()
    if backend in _available_cache:
        return _available_cache[backend]
    try:
        from . import vrans

        rng = np.random.default_rng(0)
        T, lanes = 16, _LANE_BLOCK
        freqs = rng.integers(1, 1 << 15, size=(T, lanes)).astype(np.uint32)
        starts = (rng.integers(0, 1 << 15, size=(T, lanes))).astype(np.uint32)
        w1, v1, s1 = encode_scan_pallas(
            jnp.asarray(starts), jnp.asarray(freqs),
            interpret=(backend == "cpu"),
        )
        w2, v2, s2 = vrans._encode_scan(jnp.asarray(starts), jnp.asarray(freqs), T)
        ok = (
            np.array_equal(np.asarray(s1), np.asarray(s2))
            and np.array_equal(np.asarray(v1), np.asarray(v2))
            and np.array_equal(
                np.asarray(w1)[np.asarray(v1)], np.asarray(w2)[np.asarray(v2)]
            )
        )
        _available_cache[backend] = bool(ok)
    except Exception:
        _available_cache[backend] = False
    return _available_cache[backend]
