"""Vectorized interleaved-stream rANS — the on-chip entropy coder.

N independent rANS lanes advance in lockstep as (lanes,)-wide vector ops
inside a ``lax.scan``; XLA keeps the whole coder on the TPU VPU. The design
follows the interleaving property of ryg's rANS (independent streams can be
multiplexed without signaling — ``third_party/ryg_rans/rans_byte.h:27-30``,
4-way SIMD precedent in ``rans_word_sse41.h``), with the word-variant
parameters: 32-bit state, 16-bit renormalization words, L = 1 << 16, and the
framework's 16-bit probability precision.

Differences from the reference single-stream format (``entropy/rans.py``,
which remains the bit-exact-parity coder):

* symbols are split into ``lanes`` contiguous blocks, one rANS stream each,
* out-of-range symbols fold onto the per-row escape symbol as usual, but the
  residual goes to a **side channel** of raw 32-bit values (in symbol order)
  instead of inline bypass nibbles — branch-free for vector lanes,
* tail positions are padded with the identity symbol (freq = 1 << 16), which
  provably leaves the state untouched.

Encoder state update needs a uint32/uint16 division; TPUs have no integer
divide, so it is computed as a 4-leg base-256 long division in exact-f32
range (every intermediate < 2^24), with a one-step integer correction.

Blob layout v3 (little-endian; leading flags byte has bits V2|V3 set):
    u8 flags | varint n_symbols | varint lanes | varint n_raw
    u8 count_bits | varint count_base    (bit-packed per-lane word counts:)
    packed counts[lanes x count_bits]    (count = base + delta, LSB-first;
                                          includes the 2 state words)
    u16 stream words, lane-major         (per lane: state_low, state_high,
                                          then renorm words in decode order)
    u32 raw escape values[n_raw]         (in symbol order)
The varint header (~8-10 B vs v2's fixed 17 B) matters on small tensors:
a GOP z-latent blob was ~21 B of framing for ~190 symbols.

The default lane count adapts to the tensor size (``pick_lanes``): each
lane carries ~4.5 bytes of fixed cost (2 flush words + its packed count),
so small tensors code with proportionally fewer lanes. Round-4 measurement
(tools/lane_scale_exp.py, 24x Kodak-size trained-checkpoint batch on TPU):
the scan's per-step cost scales with vector width, so dropping from 1024
to 256 lanes/image made decode 26% FASTER (81.2 -> 59.9 ms) and encode
slightly faster (152 -> 142 ms) while cutting bpp 0.510 -> 0.432; 128
lanes regressed decode (81.6 ms). ~1024 symbols/lane is the sweet spot.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "encode_interleaved",
    "decode_interleaved",
    "encode_interleaved_batch",
    "decode_interleaved_batch",
    "build_decode_lut",
    "build_search_cdf",
    "build_compact_tables",
    "build_folded_rows",
    "build_coding_cdf",
    "build_rowseq_tables",
    "rowseq_lanes",
    "rowseq_schedule",
    "encode_rowseq_async",
    "decode_rowseq_batch",
    "blob_flags",
    "low_memory_mode",
    "EncodeDeviceHandle",
    "DEFAULT_LANES",
    "pick_lanes",
    "ONEHOT_MAX_STRIDE",
]

# Per-image lane count. The scan's per-step cost is dominated by dispatch
# overhead, not vector width, so batched entry points fuse all images into
# one (T, B * DEFAULT_LANES)-wide scan.
DEFAULT_LANES = 1024
_PREC = 16
_L = np.uint32(1 << 16)
_MASK16 = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# device-side core
# ---------------------------------------------------------------------------


def _divmod_u32_u16(x, freq):
    """(x // freq, x % freq) for x: uint32 < 2^32, freq: uint32 in [1, 2^16].

    4-leg base-256 long division; every product/remainder < 2^24 so the f32
    path is exact up to one ulp, fixed by an integer correction step.
    """
    x = x.astype(jnp.uint32)
    f_f32 = freq.astype(jnp.float32)
    q = jnp.zeros_like(x)
    r = jnp.zeros_like(x)
    for k in (3, 2, 1, 0):
        d = (x >> np.uint32(8 * k)) & np.uint32(0xFF)
        r = (r << np.uint32(8)) | d
        ql = (r.astype(jnp.float32) / f_f32).astype(jnp.uint32)
        rem = r - ql * freq
        # signed correction in int32 space (rem is within [-freq, 2*freq))
        rem_s = rem.astype(jnp.int32)
        freq_s = freq.astype(jnp.int32)
        ql = (ql.astype(jnp.int32) + (rem_s >= freq_s).astype(jnp.int32)
              - (rem_s < 0).astype(jnp.int32)).astype(jnp.uint32)
        r = r - ql * freq
        q = (q << np.uint32(8)) | ql
    return q, r


@partial(jax.jit, static_argnames=("T",))
def _encode_scan(starts, freqs, T: int):
    """starts/freqs: (T, L) uint32 per-position coding params.

    Returns (words (T, L) uint16-in-uint32, valid (T, L) bool, state (L,)).
    Scan runs t = T-1 .. 0 (reverse); stream order per lane is then the
    flush words followed by the valid words in ascending t.
    """
    lanes = starts.shape[1]
    x0 = jnp.full((lanes,), _L, jnp.uint32)

    def step(x, inp):
        start, freq = inp
        emit = (x >> np.uint32(16)) >= freq
        word = (x & _MASK16).astype(jnp.uint32)
        x = jnp.where(emit, x >> np.uint32(16), x)
        q, r = _divmod_u32_u16(x, freq)
        x = (q << np.uint32(16)) + r + start
        return x, (word, emit)

    x_final, (words, valid) = jax.lax.scan(
        step, x0, (starts, freqs), reverse=True
    )
    return words, valid, x_final


@partial(jax.jit, static_argnames=("T", "w_cap"))
def _pack_emissions(words, valid, state, T: int, w_cap: int):
    """Emission compaction shared by all encode scans (see
    :func:`_encode_scan_packed` for the sort-vs-scatter rationale)."""
    lanes = words.shape[1]
    t_iota = jnp.arange(T, dtype=jnp.uint32)[:, None]
    if 2 * T <= (1 << 16):  # max key 2T-1 still fits 16 bits at the boundary
        key = jnp.where(valid, t_iota, t_iota + np.uint32(T))
        fused = (key << np.uint32(16)) | jnp.where(valid, words, 0)
        body = jax.lax.sort(fused, dimension=0) & _MASK16
    else:
        key = jnp.broadcast_to(
            jnp.where(valid, t_iota, t_iota + np.uint32(T)), words.shape
        ).astype(jnp.int32)
        _, body = jax.lax.sort(
            (key, jnp.where(valid, words, 0)), dimension=0, num_keys=1
        )
    if w_cap - 2 <= T:
        body = body[: w_cap - 2]
    else:
        body = jnp.concatenate(
            [body, jnp.zeros((w_cap - 2 - T, lanes), jnp.uint32)]
        )
    packed = jnp.concatenate(
        [(state & _MASK16)[None], (state >> np.uint32(16))[None], body]
    )
    counts = valid.sum(axis=0).astype(jnp.int32) + 2
    overflow = jnp.any(counts > w_cap)
    return packed, counts, overflow


@partial(jax.jit, static_argnames=("T", "w_cap"))
def _encode_scan_packed(starts, freqs, T: int, w_cap: int):
    """Encode + on-device stream compaction.

    Returns (packed (w_cap, L) uint32 words with [0]=state_low [1]=state_high,
    counts (L,) int32 including the 2 state words, overflow flag). Downloading
    the packed buffer costs ~bits/16 words per symbol instead of the dense
    (T, L) emission matrix.

    Compaction is a per-lane SORT along T, not a scatter: XLA's TPU scatter
    is latency-serialized like gathers (~12.5 ns/element), measured 44.8 ms
    for a 24-image Kodak-size batch, while the bitonic sort network is fully
    vectorized and runs the same compaction in 2.2 ms
    (tools/sort_compact_exp.py S0/S1). Valid emissions get key = t, invalid
    key = T + t, so an ascending sort puts the valid words first in t order;
    when 2T fits in 16 bits the key and the 16-bit word share one uint32
    (single-operand sort), otherwise a two-operand (key, word) sort is used.
    """
    words, valid, state = _encode_scan(starts, freqs, T)
    return _pack_emissions(words, valid, state, T, w_cap)


@partial(jax.jit, static_argnames=("T",))
def _decode_scan(x0, words, rows, pad_mask, lut, cdf, T: int):
    """x0: (L,) uint32 init states; words: (W, L) uint32 renorm words;
    rows: (T, L) int32 CDF-row per position; pad_mask: (T, L) bool;
    lut: (nrows, 65536) int32 cum->symbol; cdf: (nrows, stride) int32.

    Returns decoded coded-symbols (T, L) int32 (escape folded, no offset).
    """
    lanes = rows.shape[1]
    lane_iota = jnp.arange(lanes)

    def step(carry, inp):
        x, cursor = carry
        row, pad = inp
        cum = (x & _MASK16).astype(jnp.uint32)
        safe_row = jnp.maximum(row, 0)
        s = lut[safe_row, cum.astype(jnp.int32)]
        start = cdf[safe_row, s].astype(jnp.uint32)
        freq = (cdf[safe_row, s + 1] - cdf[safe_row, s]).astype(jnp.uint32)
        start = jnp.where(pad, jnp.uint32(0), start)
        freq = jnp.where(pad, _L, freq)
        s = jnp.where(pad, 0, s)

        x = freq * (x >> np.uint32(16)) + cum - start
        need = x < _L
        w = words[jnp.minimum(cursor, words.shape[0] - 1), lane_iota]
        x = jnp.where(need, (x << np.uint32(16)) | w, x)
        cursor = cursor + need.astype(jnp.int32)
        return (x, cursor), s

    (x, cursor), syms = jax.lax.scan(
        step, (x0, jnp.zeros((lanes,), jnp.int32)), (rows, pad_mask)
    )
    return syms


@partial(jax.jit, static_argnames=("T", "lanes", "w_cap", "raw_cap"))
def _encode_device_core(symbols, indexes, cdf, sizes, offsets,
                        T: int, lanes: int, w_cap: int, raw_cap: int):
    """Fully on-device encode prep + scan + compaction.

    symbols/indexes: (B, n) int32 device arrays. Returns
    (packed uint16 (w_cap, B*lanes), counts, overflow,
     raw (B, raw_cap) uint32, raw_counts (B,), raw_overflow).
    """
    B, n = symbols.shape
    idx = indexes
    maxv = sizes[idx] - 2
    value = symbols - offsets[idx]
    neg = value < 0
    over = value >= maxv
    esc = neg | over
    raw = jnp.where(
        neg, (-2 * value - 1), 2 * (value - maxv)
    ).astype(jnp.uint32)
    coded = jnp.where(esc, maxv, value)

    starts = cdf[idx, coded].astype(jnp.uint32)
    freqs = (cdf[idx, coded + 1] - cdf[idx, coded]).astype(jnp.uint32)

    # raw side channel: compact escapes per image (symbol order)
    pos = jnp.cumsum(esc, axis=1) - 1
    raw_counts = jnp.sum(esc, axis=1)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], esc.shape)
    raw_buf = jnp.zeros((B, raw_cap + 1), jnp.uint32)
    raw_buf = raw_buf.at[
        rows, jnp.where(esc, jnp.minimum(pos, raw_cap), raw_cap)
    ].set(jnp.where(esc, raw, 0), mode="drop")
    raw_overflow = jnp.any(raw_counts > raw_cap)

    pad = T * lanes - n

    def lane_layout(a, padval):
        a = jnp.concatenate(
            [a, jnp.full((B, pad), padval, a.dtype)], axis=1
        )
        # lane-blocked per image; columns ordered [b * lanes + l]
        return a.reshape(B, lanes, T).transpose(2, 0, 1).reshape(T, B * lanes)

    starts_tl = lane_layout(starts, jnp.uint32(0))
    freqs_tl = lane_layout(freqs, jnp.uint32(1 << 16))

    packed, counts, overflow = _encode_scan_packed(starts_tl, freqs_tl, T, w_cap)
    return (
        packed.astype(jnp.uint16), counts, overflow,
        raw_buf[:, :raw_cap], raw_counts, raw_overflow,
    )


@partial(jax.jit, static_argnames=("T", "lanes"))
def _decode_device_core(x0, words_u16, indexes, raw, raw_counts, lut, cdf,
                        sizes, offsets, T: int, lanes: int):
    """Fully on-device decode: scan + escape unfolding.

    indexes: (B, n) int32; words_u16: (W, B*lanes) uint16. Returns symbols
    (B, n) int32 on device.
    """
    B, n = indexes.shape
    pad = T * lanes - n

    def lane_layout(a, padval):
        a = jnp.concatenate([a, jnp.full((B, pad), padval, a.dtype)], axis=1)
        return a.reshape(B, lanes, T).transpose(2, 0, 1).reshape(T, B * lanes)

    rows = lane_layout(indexes, jnp.int32(-1))
    pad_mask = rows < 0
    words = words_u16.astype(jnp.uint32)

    syms = _decode_scan(x0, words, rows, pad_mask, lut, cdf, T)
    # (T, B*lanes) -> (B, n)
    coded = syms.reshape(T, B, lanes).transpose(1, 2, 0).reshape(B, lanes * T)[:, :n]

    maxv = sizes[indexes] - 2
    esc = coded == maxv
    pos = jnp.cumsum(esc, axis=1) - 1
    rows_b = jnp.broadcast_to(jnp.arange(B)[:, None], esc.shape)
    raw_vals = raw[rows_b, jnp.clip(pos, 0, raw.shape[1] - 1)]
    dec = (raw_vals >> np.uint32(1)).astype(jnp.int32)
    dec = jnp.where((raw_vals & np.uint32(1)) == 1, -dec - 1, dec + maxv)
    values = jnp.where(esc, dec, coded)
    return (values + offsets[indexes]).astype(jnp.int32)


def low_memory_mode() -> bool:
    """COMPRESSAI_TPU_LOW_MEM=1 trades decode speed for device memory: the
    (rows, 65536) LUT / packed sf/post tables (~0.4 MB/row) are never built;
    decode inverts the CDF by on-device binary search over the compact
    (rows, stride) table instead (log2(stride) extra gathers per symbol).
    Useful when tables would collide with model weights on busy chips."""
    import os

    return os.environ.get("COMPRESSAI_TPU_LOW_MEM") == "1"


def build_search_cdf(quantized_cdf: np.ndarray, cdf_length: np.ndarray) -> np.ndarray:
    """Compact CDF with padding raised above any cum value so a branchless
    binary search stays within each row's valid prefix."""
    cdf = np.array(quantized_cdf, np.int32)
    stride = cdf.shape[1]
    cols = np.arange(stride)[None, :]
    pad = cols >= np.asarray(cdf_length, np.int64)[:, None]
    cdf[pad] = (1 << 16) + 1
    return cdf


@partial(jax.jit, static_argnames=("T", "k_steps"))
def _decode_scan_search(x0, words, rows, pad_mask, cdf_search, cdf, T: int,
                        k_steps: int):
    """LUT-free decode scan: per step, the symbol is the largest s with
    cdf[row, s] <= cum, found by k_steps of branchless binary search over
    the compact table. State evolution is bit-identical to the LUT scans."""
    lanes = rows.shape[1]
    lane_iota = jnp.arange(lanes)
    stride = cdf_search.shape[1]

    def step(carry, inp):
        x, cursor = carry
        row, pad = inp
        cum = (x & _MASK16).astype(jnp.int32)
        safe_row = jnp.maximum(row, 0)

        pos = jnp.zeros((lanes,), jnp.int32)
        for k in range(k_steps - 1, -1, -1):
            cand = pos + (1 << k)
            ok = (cand < stride) & (cdf_search[safe_row, jnp.minimum(cand, stride - 1)] <= cum)
            pos = jnp.where(ok, cand, pos)
        s = pos
        start = cdf[safe_row, s].astype(jnp.uint32)
        freq = (cdf[safe_row, s + 1] - cdf[safe_row, s]).astype(jnp.uint32)
        start = jnp.where(pad, jnp.uint32(0), start)
        freq = jnp.where(pad, _L, freq)
        s = jnp.where(pad, 0, s)

        x = freq * (x >> np.uint32(16)) + cum.astype(jnp.uint32) - start
        need = x < _L
        w = words[jnp.minimum(cursor, words.shape[0] - 1), lane_iota]
        x = jnp.where(need, (x << np.uint32(16)) | w, x)
        cursor = cursor + need.astype(jnp.int32)
        return (x, cursor), s

    (x, cursor), syms = jax.lax.scan(
        step, (x0, jnp.zeros((lanes,), jnp.int32)), (rows, pad_mask)
    )
    return syms


@partial(jax.jit, static_argnames=("T", "lanes", "k_steps"))
def _decode_device_core_search(x0, words_u16, indexes, raw, raw_counts,
                               cdf_search, cdf, sizes, offsets,
                               T: int, lanes: int, k_steps: int):
    """LUT-free variant of :func:`_decode_device_core` (low-memory mode)."""
    B, n = indexes.shape
    pad = T * lanes - n

    def lane_layout(a, padval):
        a = jnp.concatenate([a, jnp.full((B, pad), padval, a.dtype)], axis=1)
        return a.reshape(B, lanes, T).transpose(2, 0, 1).reshape(T, B * lanes)

    rows = lane_layout(indexes, jnp.int32(-1))
    pad_mask = rows < 0
    words = words_u16.astype(jnp.uint32)

    syms = _decode_scan_search(x0, words, rows, pad_mask, cdf_search, cdf, T,
                               k_steps)
    coded = syms.reshape(T, B, lanes).transpose(1, 2, 0).reshape(B, lanes * T)[:, :n]

    maxv = sizes[indexes] - 2
    esc = coded == maxv
    pos = jnp.cumsum(esc, axis=1) - 1
    rows_b = jnp.broadcast_to(jnp.arange(B)[:, None], esc.shape)
    raw_vals = raw[rows_b, jnp.clip(pos, 0, raw.shape[1] - 1)]
    dec = (raw_vals >> np.uint32(1)).astype(jnp.int32)
    dec = jnp.where((raw_vals & np.uint32(1)) == 1, -dec - 1, dec + maxv)
    values = jnp.where(esc, dec, coded)
    return (values + offsets[indexes]).astype(jnp.int32)


def build_decode_lut(quantized_cdf: np.ndarray, cdf_length: np.ndarray) -> np.ndarray:
    """(nrows, 65536) int32: cumulative frequency -> symbol, per CDF row."""
    n, _ = quantized_cdf.shape
    lut = np.zeros((n, 1 << _PREC), dtype=np.int32)
    cums = np.arange(1 << _PREC)
    for i in range(n):
        size = int(cdf_length[i])
        lut[i] = np.searchsorted(quantized_cdf[i, :size], cums, side="right") - 1
    return lut


_POST_ESC = -32768  # int16 sentinel marking the escape symbol in `post`


def build_packed_tables(quantized_cdf, cdf_length, offset, lut=None):
    """Gather-minimizing decode/encode tables (one fused gather per symbol).

    Returns a dict or None when the tables don't fit the packed ranges:
        sf:   (n, 65536) uint32 = start | (freq-1) << 16, indexed by [row, cum]
        post: (n, 65536) int16  = decoded symbol + offset, or -32768 (escape)
        mo:   (n,) uint32 = (offset + 32768) | max_value << 16
        cdf2: (n, stride-1) uint32 = start | (freq-1) << 16, indexed by
              [row, coded_symbol] (encoder side)
    """
    quantized_cdf = np.asarray(quantized_cdf, np.int64)
    cdf_length = np.asarray(cdf_length, np.int64)
    offset = np.asarray(offset, np.int64)
    maxv = cdf_length - 2
    if (
        offset.min() < -32768 or offset.max() > 32767
        or maxv.max() >= (1 << 16) or maxv.min() < 0
    ):
        return None
    if lut is None:
        lut = build_decode_lut(
            quantized_cdf.astype(np.int32), cdf_length.astype(np.int32)
        )
    lut = np.asarray(lut, np.int64)
    start = np.take_along_axis(quantized_cdf, lut, axis=1)
    nxt = np.take_along_axis(quantized_cdf, lut + 1, axis=1)
    freq = np.maximum(nxt - start, 1)
    sf = (start | ((freq - 1) << 16)).astype(np.uint32)
    esc = lut == maxv[:, None]
    post64 = np.where(esc, _POST_ESC, lut + offset[:, None])
    if post64.max() > 32767 or np.where(esc, 0, post64).min() < -32767:
        return None
    post = post64.astype(np.int16)
    mo = ((offset + 32768) | (maxv << 16)).astype(np.uint32)
    c = quantized_cdf
    f2 = np.maximum(c[:, 1:] - c[:, :-1], 1)
    cdf2 = (c[:, :-1] | ((f2 - 1) << 16)).astype(np.uint32)
    return {"sf": sf, "post": post, "mo": mo, "cdf2": cdf2}


# ---------------------------------------------------------------------------
# Gather-free compact-table cores (one-hot MXU row select).
#
# Measured on TPU v5e (tools/decode_core_exp.py, 24x Kodak-size factorized
# latents, 192 rows x stride 19): the sf-gather decode core runs 253 ms —
# gather-latency-bound at ~12.5 ns per computed gather (2/symbol). Replacing
# (a) the renorm-word fetch with an in-VMEM shifting word queue and (b) the
# cum->(start,freq,symbol) table gather with an exact one-hot matmul over the
# compact CDF rows + compare/count/max/min reductions runs the same decode in
# 31 ms (8x) with ZERO gathers per symbol — and needs only the (rows, stride)
# compact tables (~'65536x smaller than the sf/post/lut set).
#
# Exactness: the one-hot operand is 0/1 (bf16-exact); table entries are split
# into hi/lo bytes (integers <= 256, bf16-exact); each product is exact and
# each f32-accumulated output row has exactly one nonzero term, so
# hi*256 + lo reconstructs the integer table value exactly. Verified
# element-exact against the gather cores on TPU and CPU.
# ---------------------------------------------------------------------------

# compact one-hot coding uses coarse rows of at most this many symbols; the
# per-step (lanes, stride) matmul/compare work grows linearly with stride
# but rides the MXU — measured on v5e, stride 196 (trained EB tables)
# decodes within ~1.2x of stride 20 (empirical tables). Rows wider than
# this are FOLDED (round 4): each wide row is re-expressed as a coarse CDF
# over buckets of 2^k symbols whose frequencies are multiples of 2^k, and
# the scan synthesizes the wide-table (start, freq) on the fly —
#     start_v = C_q + (F_q >> k) * rem,   freq_v = F_q >> k
# with rem recovered in-decode by one exact small-integer division. This
# gives the 64-row Gaussian scale table (stride ~3100, the y-latent of
# every hyperprior-family model — reference rans_interface.cpp:247-252 is
# the path replaced) the same zero-gather MXU decode as narrow tables,
# with no bitstream side channel: the blob is plain interleaved rANS over
# the synthesized wide CDF (``build_coding_cdf``). k = 0 rows reproduce
# the unfolded coder bit-for-bit.
ONEHOT_MAX_STRIDE = 256
_FOLD_MAX_COARSE = ONEHOT_MAX_STRIDE - 2  # max coarse symbols incl. escape


def _fold_k(maxv: int) -> int:
    """Smallest k with ceil(maxv / 2^k) + 1 coarse symbols <= the one-hot
    stride budget."""
    k = 0
    while -(-maxv >> k) + 1 > _FOLD_MAX_COARSE:
        k += 1
    return k


def build_folded_rows(quantized_cdf, cdf_length):
    """Per-row coarse CDFs for the folding scheme.

    Returns (coarse_cdf (R, P) int64, coarse_len (R,), ks (R,)) where row r
    has coarse_len[r] cdf points over Q_r = ceil(maxv_r / 2^k_r) in-range
    buckets plus the escape symbol. For k_r > 0, bucket frequencies are
    multiples of 2^k_r (each >= 2^k_r) so freq_v = F_q >> k_r >= 1 is exact;
    the escape frequency absorbs the rounding remainder and stays within
    [esc_orig, esc_orig + 2^k). k_r = 0 rows are copied verbatim.
    """
    quantized_cdf = np.asarray(quantized_cdf, np.int64)
    cdf_length = np.asarray(cdf_length, np.int64)
    R = quantized_cdf.shape[0]
    maxv = cdf_length - 2
    ks = np.array([_fold_k(int(m)) for m in maxv], np.int64)
    # Q = ceil(maxv / 2^k) in-range buckets + escape -> Q + 2 cdf points
    coarse_len = np.where(ks > 0, (-(-maxv >> ks)) + 2, cdf_length)
    P = int(coarse_len.max())
    coarse = np.zeros((R, P), np.int64)
    for r in range(R):
        k, m, L = int(ks[r]), int(maxv[r]), int(cdf_length[r])
        c = quantized_cdf[r, :L]
        if k == 0:
            coarse[r, :L] = c
            continue
        unit = 1 << k
        Q = -(-m >> k)
        edges = np.minimum(np.arange(Q + 1) << k, m)
        B = c[edges[1:]] - c[edges[:-1]]  # true bucket masses, sum = c[m]
        esc_orig = int(c[L - 1] - c[m])
        target_units = int(c[m]) >> k  # in-range unit budget
        U = np.maximum(1, np.round(B / unit).astype(np.int64))
        diff = target_units - int(U.sum())
        if diff > 0:
            # grant extra units to the largest buckets (round-robin)
            order = np.argsort(-B, kind="stable")
            U[order[np.arange(diff) % Q]] += 1
        while diff < 0:
            # reclaim units from buckets above the 1-unit floor
            cand = np.flatnonzero(U > 1)
            take = min(len(cand), -diff)
            order = cand[np.argsort(-(U[cand] * unit - B[cand]), kind="stable")]
            U[order[:take]] -= 1
            diff += take
        F = U * unit
        pts = np.concatenate([[0], np.cumsum(F)])
        coarse[r, : Q + 1] = pts
        coarse[r, Q + 1] = 1 << 16  # escape freq = 65536 - pts[Q] >= esc_orig
        assert pts[Q] + esc_orig <= (1 << 16)
    return coarse, coarse_len, ks


def _compact_gates_ok(offset, maxv) -> bool:
    """Shared eligibility gate for the one-hot compact/folded coder; MUST
    stay in sync between :func:`build_compact_tables` (device cores) and
    :func:`build_coding_cdf` (host fallbacks) so both sides pick the same
    coding tables."""
    return bool(
        offset.min() >= -32767
        and offset.max() <= 32767
        and maxv.min() >= 0
        and maxv.max() <= _FOLD_MAX_COARSE << 7  # k <= 7 keeps bytes exact
        and (offset + maxv).max() <= 32767
    )


def build_coding_cdf(quantized_cdf, cdf_length, offset=None):
    """The wide CDF the tpu format ACTUALLY codes with: for folded rows the
    synthesized per-symbol table C_v = C_q + (F_q >> k) * rem; verbatim rows
    otherwise. Host fallback encoders/decoders use this so their bitstreams
    match the on-device folded cores byte-for-byte. Returns the input object
    itself when no row folds (or the compact gates fail, in which case the
    device side uses unfolded tables too)."""
    quantized_cdf = np.asarray(quantized_cdf)
    cdf_length = np.asarray(cdf_length, np.int64)
    maxv = cdf_length - 2
    if offset is not None and not _compact_gates_ok(
        np.asarray(offset, np.int64), maxv
    ):
        return quantized_cdf
    if all(_fold_k(int(m)) == 0 for m in maxv):
        return quantized_cdf
    coarse, coarse_len, ks = build_folded_rows(quantized_cdf, cdf_length)
    out = np.zeros_like(np.asarray(quantized_cdf, np.int64))
    for r in range(out.shape[0]):
        k, m, L = int(ks[r]), int(maxv[r]), int(cdf_length[r])
        if k == 0:
            out[r, :L] = coarse[r, :L]
            continue
        v = np.arange(m, dtype=np.int64)
        q, rem = v >> k, v & ((1 << k) - 1)
        F = coarse[r, q + 1] - coarse[r, q]
        out[r, :m] = coarse[r, q] + (F >> k) * rem
        Q = -(-m >> k)
        out[r, m] = coarse[r, Q]  # escape start
        out[r, m + 1] = 1 << 16
    return out.astype(np.int32)


def build_compact_tables(quantized_cdf, cdf_length, offset):
    """Split-byte matrices for the gather-free one-hot coder (with wide rows
    folded — see the fold note above), or None when the values are out of
    the int16/fold range.

    Returns dict:
        dec_hi/dec_lo: (R, S+3) float32-storable split bytes of
            [coarse_search_cdf | offset+32768 | max_value | k]
        enc_hi/enc_lo: (R, 2(S-1)+3) split bytes of
            [coarse_start_table | coarse_freq_table | offset+32768
             | max_value | k]
    (bf16 casting happens at device upload; all entries are <= 257 so the
    bf16 cast is exact.)
    """
    quantized_cdf = np.asarray(quantized_cdf, np.int64)
    cdf_length = np.asarray(cdf_length, np.int64)
    offset = np.asarray(offset, np.int64)
    maxv = cdf_length - 2
    if not _compact_gates_ok(offset, maxv):
        return None
    coarse, coarse_len, ks = build_folded_rows(quantized_cdf, cdf_length)
    S = int(coarse_len.max())
    coarse = coarse[:, :S]
    cdfS = build_search_cdf(
        coarse.astype(np.int32), coarse_len.astype(np.int32)
    ).astype(np.int64)
    offp = (offset + 32768)[:, None]
    kcol = ks[:, None]
    dec = np.concatenate([cdfS, offp, maxv[:, None], kcol], axis=1)
    start_t = coarse[:, : S - 1]
    freq_t = np.maximum(coarse[:, 1:] - coarse[:, :-1], 0)
    enc = np.concatenate([start_t, freq_t, offp, maxv[:, None], kcol], axis=1)

    def split(m):
        return (m // 256).astype(np.float32), (m % 256).astype(np.float32)

    dec_hi, dec_lo = split(dec)
    enc_hi, enc_lo = split(enc)
    return {"dec_hi": dec_hi, "dec_lo": dec_lo, "enc_hi": enc_hi, "enc_lo": enc_lo}


def build_rowseq_tables(quantized_cdf, cdf_length, offset):
    """Integer coarse tables for the row-sequential (step-major) cores, or
    None when the compact gates fail. Same fold semantics (and therefore the
    same synthesized coding CDF) as :func:`build_compact_tables` — streams
    produced by either core family decode with the other's tables."""
    quantized_cdf = np.asarray(quantized_cdf, np.int64)
    cdf_length = np.asarray(cdf_length, np.int64)
    offset = np.asarray(offset, np.int64)
    maxv = cdf_length - 2
    if not _compact_gates_ok(offset, maxv):
        return None
    coarse, coarse_len, ks = build_folded_rows(quantized_cdf, cdf_length)
    S = int(coarse_len.max())
    coarse = coarse[:, :S]
    search = build_search_cdf(
        coarse.astype(np.int32), coarse_len.astype(np.int32)
    )
    start_t = coarse[:, : S - 1].astype(np.int32)
    freq_t = np.maximum(coarse[:, 1:] - coarse[:, :-1], 0).astype(np.int32)
    return {
        "search": search, "start": start_t, "freq": freq_t,
        "off": offset.astype(np.int32), "maxv": maxv.astype(np.int32),
        "k": ks.astype(np.int32),
    }


def _onehot_rows(rows, R: int):
    return (rows[..., None] == jnp.arange(R, dtype=jnp.int32)).astype(jnp.bfloat16)


def _exact_select(onehot, tbl_hi, tbl_lo):
    """Exact integer row select as two bf16 matmuls: onehot @ (hi*256+lo)."""
    hi = jnp.matmul(onehot, tbl_hi, preferred_element_type=jnp.float32)
    lo = jnp.matmul(onehot, tbl_lo, preferred_element_type=jnp.float32)
    return hi * 256.0 + lo


def _shift_refill(x, buf, need):
    """Renorm from a per-lane word queue carried through the scan: lane reads
    queue head and conditionally shifts its column up — no computed gather."""
    w = buf[0]
    x = jnp.where(need, (x << np.uint32(16)) | w, x)
    shifted = jnp.concatenate(
        [buf[1:], jnp.zeros((1, buf.shape[1]), jnp.uint32)]
    )
    buf = jnp.where(need[None, :], shifted, buf)
    return x, buf


def _expand_stream(flat, counts, max_w: int):
    """Per-lane (x0, word-queue) from the flat uploaded word stream.

    Gather-free: slot (j, lane) with j in [0, max_w + 2) draws from flat
    position bounds[lane] + j when j < counts[lane]. Sorting slot ids by
    that source key aligns them with the flat stream order; sorting the
    (slot, word) pairs back by slot id yields the dense word matrix without
    a computed gather (measured 29.3 -> 25.9 ms on a 24-image batch,
    tools/sort_compact_exp.py X0/X1).

    Preconditions (the rank-based double sort silently misaligns words for
    ALL subsequent lanes if violated — unlike the old clamped gather, which
    degraded only locally):
      * counts[lane] <= max_w + 2 for every lane (so each lane's words all
        land in real slots), and
      * counts.sum() <= flat.shape[0] (every flat word has a slot).
    Callers guarantee both: max_w is derived from max(counts) - 2 and the
    upload buffer is padded to cap >= total words (asserted host-side in
    :func:`decode_batch_device`). Slots past counts[lane] are masked by
    ``valid`` afterwards, so flat's tail content is irrelevant."""
    cap = flat.shape[0]
    L = counts.shape[0]
    n_slots = (max_w + 2) * L
    flat32 = flat.astype(jnp.uint32)

    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    j = jnp.arange(max_w + 2, dtype=jnp.int32)[:, None]
    valid = j < counts[None, :]
    src = jnp.where(valid, bounds[None, :] + j, cap).reshape(-1)
    slot = jnp.arange(n_slots, dtype=jnp.int32)
    _, slot_by_src = jax.lax.sort((src, slot), dimension=0, num_keys=1)

    if n_slots > cap:
        flat_pad = jnp.concatenate(
            [flat32, jnp.zeros((n_slots - cap,), jnp.uint32)]
        )
    else:
        flat_pad = flat32[:n_slots]
    _, words = jax.lax.sort((slot_by_src, flat_pad), dimension=0, num_keys=1)
    words = jnp.where(valid, words.reshape(max_w + 2, L), jnp.uint32(0))

    x0 = words[0] | (words[1] << np.uint32(16))
    return x0, words[2:]


def _exact_div_u16(num, den):
    """num // den for int32 num in [0, 2^16], den in [1, 2^16]: one exact-f32
    division (both operands < 2^24, error < 1 ulp) + integer correction."""
    q = (num.astype(jnp.float32) / den.astype(jnp.float32)).astype(jnp.int32)
    r = num - q * den
    return q + (r >= den).astype(jnp.int32) - (r < 0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("T",))
def _decode_scan_onehot(x0, buf, rows, pad_mask, dec_hi, dec_lo, T: int):
    """Gather-free decode scan over (possibly folded) coarse rows. Emits
    per position:
        v:  int16 decoded value (symbol+offset), _POST_ESC at escapes
        mo: uint32 (offset+32768) | max_value << 16  (escape unfolding)
    For folded rows (k > 0) the wide-table (start, freq) is synthesized
    in-scan: bucket q from the coarse compare-count, rem from one exact
    division, start_v = C_q + (F_q >> k) * rem, freq_v = F_q >> k. k = 0
    rows take the identical arithmetic with rem = 0, so state evolution is
    bit-identical to the unfolded gather scans there."""
    R = dec_hi.shape[0]
    S = dec_hi.shape[1] - 3

    def step(carry, inp):
        x, buf = carry
        row, pad = inp
        cum = (x & _MASK16).astype(jnp.int32)
        ext = _exact_select(_onehot_rows(row, R), dec_hi, dec_lo)
        rcdf = ext[:, :S]
        offp = ext[:, S]
        maxv = ext[:, S + 1]
        k = ext[:, S + 2].astype(jnp.int32)
        le = rcdf <= cum.astype(jnp.float32)[:, None]
        s = jnp.sum(le, axis=1).astype(jnp.int32) - 1
        start = jnp.max(jnp.where(le, rcdf, 0.0), axis=1).astype(jnp.int32)
        nxt = jnp.min(jnp.where(le, 65537.0, rcdf), axis=1).astype(jnp.int32)

        maxv_i = maxv.astype(jnp.int32)
        unit_m1 = (jnp.int32(1) << k) - 1
        big_q = jnp.right_shift(maxv_i + unit_m1, k)  # escape bucket index
        f = nxt - start
        g = jnp.maximum(jnp.where(s == big_q, f, jnp.right_shift(f, k)), 1)
        num = cum - start
        rem = _exact_div_u16(num, g)  # 0 when k == 0 or escape (num < g)
        startv = (start + g * rem).astype(jnp.uint32)
        freq = g.astype(jnp.uint32)
        startv = jnp.where(pad, jnp.uint32(0), startv)
        freq = jnp.where(pad, _L, freq)

        v_full = jnp.left_shift(s, k) | rem
        off_i = offp.astype(jnp.int32) - 32768
        v = jnp.where(v_full >= maxv_i, _POST_ESC, v_full + off_i)
        v = jnp.where(pad, 0, v).astype(jnp.int16)
        mo = offp.astype(jnp.uint32) | (
            maxv.astype(jnp.uint32) << np.uint32(16)
        )

        x = freq * (x >> np.uint32(16)) + (x & _MASK16) - startv
        x, buf = _shift_refill(x, buf, x < _L)
        return (x, buf), (v, mo)

    _, (vs, mos) = jax.lax.scan(step, (x0, buf), (rows, pad_mask))
    return vs, mos


@partial(jax.jit, static_argnames=("T", "lanes", "max_w", "has_raw"))
def _decode_device_core_onehot(flat, counts, indexes, raw, dec_hi, dec_lo,
                               T: int, lanes: int, max_w: int, has_raw: bool):
    """Fused gather-free decode: stream expansion, one-hot scan, escape
    unfolding. Returns (B, n) int32 symbols on device."""
    B, n = indexes.shape
    L = B * lanes
    pad = T * lanes - n

    x0, buf = _expand_stream(flat, counts, max_w)

    def lane_layout(a, padval):
        a = jnp.concatenate([a, jnp.full((B, pad), padval, a.dtype)], axis=1)
        return a.reshape(B, lanes, T).transpose(2, 0, 1).reshape(T, L)

    rows = lane_layout(indexes, jnp.int32(-1))
    pad_mask = rows < 0

    vs, mos = _decode_scan_onehot(x0, buf, rows, pad_mask, dec_hi, dec_lo, T)

    def to_bn(a):
        return a.reshape(T, B, lanes).transpose(1, 2, 0).reshape(B, lanes * T)[:, :n]

    v = to_bn(vs).astype(jnp.int32)
    if not has_raw:
        return v

    mo = to_bn(mos)
    esc = v == _POST_ESC
    pos = jnp.cumsum(esc, axis=1) - 1
    rows_b = jnp.broadcast_to(jnp.arange(B)[:, None], esc.shape)
    raw_vals = raw[rows_b, jnp.clip(pos, 0, raw.shape[1] - 1)]
    offset = (mo & _MASK16).astype(jnp.int32) - 32768
    maxv = (mo >> np.uint32(16)).astype(jnp.int32)
    dec = (raw_vals >> np.uint32(1)).astype(jnp.int32)
    dec = jnp.where((raw_vals & np.uint32(1)) == 1, -dec - 1 + offset,
                    dec + maxv + offset)
    return jnp.where(esc, dec, v)


@partial(jax.jit, static_argnames=("T", "lanes", "w_cap"))
def _encode_device_core_onehot(symbols, indexes, enc_hi, enc_lo,
                               T: int, lanes: int, w_cap: int):
    """On-device encode with gather-free one-hot (start,freq,offset,maxv)
    lookups. Byte-compatible with the gather encode cores.

    Returns the packed (w_cap, L) word matrix (downloaded as a short slice
    + host trim — measured 2x faster than an on-device flat-concatenation
    scatter, tools/encode_core_exp.py E5) and the *dense* escape channel
    (esc, raw); compaction is deferred to :func:`_raw_compact`, dispatched
    only when escapes exist (E4: the scatter costs ~58 ms per 24-image
    batch even when empty)."""
    B, n = symbols.shape
    R = enc_hi.shape[0]
    S1 = (enc_hi.shape[1] - 3) // 2  # = coarse stride - 1

    def per_image(args):
        sym, idx = args
        ext = _exact_select(_onehot_rows(idx, R), enc_hi, enc_lo)
        off = ext[:, -3].astype(jnp.int32) - 32768
        maxv = ext[:, -2].astype(jnp.int32)
        k = ext[:, -1].astype(jnp.int32)
        value = sym - off
        esc = (value < 0) | (value >= maxv)
        raw = jnp.where(
            value < 0, (-2 * value - 1), 2 * (value - maxv)
        ).astype(jnp.uint32)
        # folded coding (see the fold note above): bucket q = value >> k,
        # escape bucket Q = ceil(maxv / 2^k); k = 0 is the unfolded case
        unit_m1 = (jnp.int32(1) << k) - 1
        big_q = jnp.right_shift(maxv + unit_m1, k)
        safe_value = jnp.clip(value, 0, maxv - 1)
        coded = jnp.where(esc, big_q, jnp.right_shift(safe_value, k))
        rem = jnp.where(esc, 0, safe_value & unit_m1)
        colsel = (
            coded[:, None] == jnp.arange(S1, dtype=jnp.int32)
        ).astype(jnp.float32)
        cstart = jnp.sum(ext[:, :S1] * colsel, axis=1).astype(jnp.int32)
        cfreq = jnp.sum(ext[:, S1 : 2 * S1] * colsel, axis=1).astype(jnp.int32)
        g = jnp.maximum(
            jnp.where(esc, cfreq, jnp.right_shift(cfreq, k)), 1
        )
        start = cstart + g * rem
        return (
            start.astype(jnp.uint32), g.astype(jnp.uint32), esc, raw
        )

    starts, freqs, esc, raw = jax.lax.map(per_image, (symbols, indexes))
    raw_counts = jnp.sum(esc, axis=1)

    pad = T * lanes - n
    L = B * lanes

    def lane_layout(a, padval):
        a = jnp.concatenate([a, jnp.full((B, pad), padval, a.dtype)], axis=1)
        return a.reshape(B, lanes, T).transpose(2, 0, 1).reshape(T, L)

    starts_tl = lane_layout(starts, jnp.uint32(0))
    freqs_tl = lane_layout(freqs, jnp.uint32(1 << 16))

    packed, counts, overflow = _encode_scan_packed(starts_tl, freqs_tl, T, w_cap)
    return packed, counts, overflow, esc, raw, raw_counts


# ---------------------------------------------------------------------------
# Row-sequential (step-major) cores — for channel-indexed tables.
#
# When the CDF row is a function of the CHANNEL (EntropyBottleneck: the
# reference builds per-channel index tensors, entropy_models.py:518-529),
# the row schedule is known before coding. Laying the symbols out PLANAR
# (channel-major) on a step-major grid — position of (step t, lane l) in an
# image's flat order is t * lanes + l — makes the row CONSTANT across all
# lanes of every step whenever lanes divides H*W. The scan then consumes a
# (T,)-row schedule: per step it slices ONE small table row and selects
# start/freq with a (lanes, S) masked sum — no one-hot MXU matmuls, no
# (B, n)-sized select intermediates, no gathers. Measured on TPU (round 4):
# the standalone one-hot select pass alone cost 97 ms per 24-image
# Kodak-size batch; this path eliminates it entirely. Blobs carry
# _FLAG_STEPMAJOR so the decoder picks the same grid; fold semantics
# (coarse rows, k bits) are identical to the one-hot cores.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("T", "lanes", "w_cap"))
def _encode_device_core_rowseq(symbols, rows_t, start_tab, freq_tab,
                               off_tab, maxv_tab, k_tab,
                               T: int, lanes: int, w_cap: int):
    """symbols: (B, n) int32 in PLANAR (channel-major) flat order with
    n == T * lanes exactly; rows_t: (T,) int32 CDF row per scan step.
    Returns the same tuple as :func:`_encode_device_core_onehot` (escape
    channel in planar symbol order)."""
    B, n = symbols.shape
    L = B * lanes
    start_T = start_tab[rows_t]          # (T, S1) — T tiny-row gathers
    freq_T = freq_tab[rows_t]
    off_t = off_tab[rows_t]              # (T,)
    maxv_t = maxv_tab[rows_t]
    k_t = k_tab[rows_t]

    grid = symbols.reshape(B, T, lanes).transpose(1, 0, 2).reshape(T, L)
    value = grid - off_t[:, None]
    esc = (value < 0) | (value >= maxv_t[:, None])
    raw_g = jnp.where(
        value < 0, (-2 * value - 1), 2 * (value - maxv_t[:, None])
    ).astype(jnp.uint32)
    unit_m1 = (jnp.int32(1) << k_t) - 1
    big_q = jnp.right_shift(maxv_t + unit_m1, k_t)
    sv = jnp.clip(value, 0, maxv_t[:, None] - 1)
    coded = jnp.where(
        esc, big_q[:, None], jnp.right_shift(sv, k_t[:, None])
    )
    rem = jnp.where(esc, 0, sv & unit_m1[:, None])

    S1 = start_tab.shape[1]
    col = jnp.arange(S1, dtype=jnp.int32)[None, :]
    x0 = jnp.full((L,), _L, jnp.uint32)

    def step(x, inp):
        coded_t, rem_t, esc_t, srow, frow, k = inp
        sel = coded_t[:, None] == col
        cstart = jnp.sum(jnp.where(sel, srow[None, :], 0), axis=1)
        F = jnp.sum(jnp.where(sel, frow[None, :], 0), axis=1)
        g = jnp.maximum(jnp.where(esc_t, F, jnp.right_shift(F, k)), 1)
        start = (cstart + g * rem_t).astype(jnp.uint32)
        freq = g.astype(jnp.uint32)

        emit = (x >> np.uint32(16)) >= freq
        word = (x & _MASK16).astype(jnp.uint32)
        x = jnp.where(emit, x >> np.uint32(16), x)
        q_, r_ = _divmod_u32_u16(x, freq)
        x = (q_ << np.uint32(16)) + r_ + start
        return x, (word, emit)

    x_final, (words, valid) = jax.lax.scan(
        step, x0, (coded, rem, esc, start_T, freq_T, k_t), reverse=True
    )
    packed, counts, overflow = _pack_emissions(words, valid, x_final, T, w_cap)

    esc_bn = esc.reshape(T, B, lanes).transpose(1, 0, 2).reshape(B, n)
    raw_bn = raw_g.reshape(T, B, lanes).transpose(1, 0, 2).reshape(B, n)
    raw_counts = jnp.sum(esc_bn, axis=1)
    return (
        packed.astype(jnp.uint16), counts, overflow,
        esc_bn, raw_bn, raw_counts,
    )


@partial(jax.jit, static_argnames=("T", "lanes", "max_w", "has_raw"))
def _decode_device_core_rowseq(flat, counts, rows_t, raw, search, off_tab,
                               maxv_tab, k_tab,
                               T: int, lanes: int, max_w: int, has_raw: bool):
    """Step-major decode: returns (B, n) int32 symbols in PLANAR order
    (B inferred from the counts shape)."""
    L = counts.shape[0]
    B = L // lanes
    n = T * lanes
    search_T = search[rows_t]            # (T, S)
    off_t = off_tab[rows_t]
    maxv_t = maxv_tab[rows_t]
    k_t = k_tab[rows_t]

    x0, buf = _expand_stream(flat, counts, max_w)

    def step(carry, inp):
        x, buf = carry
        crow, off, maxv, k = inp
        cum = (x & _MASK16).astype(jnp.int32)
        le = crow[None, :] <= cum[:, None]
        s = jnp.sum(le, axis=1).astype(jnp.int32) - 1
        start = jnp.max(jnp.where(le, crow[None, :], 0), axis=1)
        nxt = jnp.min(jnp.where(le, 65537, crow[None, :]), axis=1)
        f = nxt - start
        big_q = jnp.right_shift(maxv + (jnp.int32(1) << k) - 1, k)
        g = jnp.maximum(jnp.where(s == big_q, f, jnp.right_shift(f, k)), 1)
        num = cum - start
        rem = _exact_div_u16(num, g)
        startv = (start + g * rem).astype(jnp.uint32)
        freq = g.astype(jnp.uint32)

        v_full = jnp.left_shift(s, k) | rem
        v = jnp.where(v_full >= maxv, _POST_ESC, v_full + off).astype(jnp.int16)

        x = freq * (x >> np.uint32(16)) + (x & _MASK16) - startv
        x, buf = _shift_refill(x, buf, x < _L)
        return (x, buf), v

    _, vs = jax.lax.scan(
        step, (x0, buf), (search_T, off_t, maxv_t, k_t)
    )
    v = vs.reshape(T, B, lanes).transpose(1, 0, 2).reshape(B, n).astype(jnp.int32)
    if not has_raw:
        return v

    esc = v == _POST_ESC
    pos = jnp.cumsum(esc, axis=1) - 1
    rows_b = jnp.broadcast_to(jnp.arange(B)[:, None], esc.shape)
    raw_vals = raw[rows_b, jnp.clip(pos, 0, raw.shape[1] - 1)]
    off_bn = jnp.broadcast_to(
        off_t[:, None], (T, lanes)
    ).reshape(1, n)
    maxv_bn = jnp.broadcast_to(
        maxv_t[:, None], (T, lanes)
    ).reshape(1, n)
    dec = (raw_vals >> np.uint32(1)).astype(jnp.int32)
    dec = jnp.where(
        (raw_vals & np.uint32(1)) == 1, -dec - 1 + off_bn,
        dec + maxv_bn + off_bn,
    )
    return jnp.where(esc, dec, v)


def rowseq_lanes(n: int, hw: int):
    """Lane count for the step-major grid: the pick_lanes choice reduced
    until it divides the per-channel spatial size (row-constant steps need
    lanes | hw). Returns None when the grid degenerates (< 8 lanes)."""
    lanes = pick_lanes(n)
    while lanes > 1 and hw % lanes:
        lanes >>= 1
    if lanes < 8 or n % lanes:
        return None
    return lanes


def rowseq_schedule(n_channels: int, hw: int, lanes: int) -> np.ndarray:
    """(T,) int32 CDF-row (channel) id per scan step for the planar
    step-major grid."""
    T = n_channels * hw // lanes
    return ((np.arange(T, dtype=np.int64) * lanes) // hw).astype(np.int32)


@partial(jax.jit, static_argnames=("raw_cap",))
def _raw_compact(esc, raw, raw_cap: int):
    """Compact the dense escape channel to (B, raw_cap) in symbol order.

    Sort-based for the same reason as `_encode_scan_packed` (scatter is
    latency-serialized; measured 57.8 -> 37.9 ms on a 24-image batch,
    tools/sort_compact_exp.py R0/R1)."""
    B, n = esc.shape
    pos = jnp.arange(n, dtype=jnp.int32)[None, :]
    key = jnp.broadcast_to(jnp.where(esc, pos, pos + n), raw.shape)
    _, sorted_raw = jax.lax.sort(
        (key, jnp.where(esc, raw, 0)), dimension=1, num_keys=1
    )
    if raw_cap <= n:
        out = sorted_raw[:, :raw_cap]
    else:
        out = jnp.concatenate(
            [sorted_raw, jnp.zeros((B, raw_cap - n), raw.dtype)], axis=1
        )
    valid = jnp.arange(raw_cap)[None, :] < jnp.sum(esc, axis=1)[:, None]
    return jnp.where(valid, out, 0)


@partial(jax.jit, static_argnames=("cap_w",))
def _slice_packed(packed, cap_w: int):
    return packed[:cap_w].astype(jnp.uint16)


@partial(jax.jit, static_argnames=("T",))
def _decode_scan_sf(x0, words, rows, pad_mask, sf, T: int):
    """Single-table-gather decode scan: emits per-position `cum` (uint16);
    symbols are recovered afterwards in one bulk `post` gather. Renorm words
    come from the shifting word queue (``words`` doubles as the initial
    queue) instead of a per-step computed gather — measured 22% faster
    (tools/decode_core_exp.py V1). Bit-identical to :func:`_decode_scan`
    state evolution."""

    def step(carry, inp):
        x, buf = carry
        row, pad = inp
        cum = (x & _MASK16).astype(jnp.uint32)
        safe_row = jnp.maximum(row, 0)
        v = sf[safe_row, cum.astype(jnp.int32)]
        start = v & _MASK16
        freq = (v >> np.uint32(16)) + np.uint32(1)
        start = jnp.where(pad, jnp.uint32(0), start)
        freq = jnp.where(pad, _L, freq)

        x = freq * (x >> np.uint32(16)) + cum - start
        x, buf = _shift_refill(x, buf, x < _L)
        return (x, buf), cum.astype(jnp.uint16)

    (x, _), cums = jax.lax.scan(step, (x0, words), (rows, pad_mask))
    return cums


@partial(jax.jit, static_argnames=("T", "lanes", "max_w", "has_raw"))
def _decode_device_core2(flat, counts, indexes, raw, raw_counts, sf, post, mo,
                         T: int, lanes: int, max_w: int, has_raw: bool):
    """Fused on-device decode: per-lane stream expansion (gathers from the
    flat uploaded word stream), the sf scan, bulk symbol recovery, and escape
    unfolding. flat: (cap,) uint16; counts: (B*lanes,) int32 (per-lane word
    counts incl. the 2 state words); indexes: (B, n) int32."""
    B, n = indexes.shape
    L = B * lanes
    pad = T * lanes - n

    x0, words = _expand_stream(flat, counts, max_w)

    def lane_layout(a, padval):
        a = jnp.concatenate([a, jnp.full((B, pad), padval, a.dtype)], axis=1)
        return a.reshape(B, lanes, T).transpose(2, 0, 1).reshape(T, L)

    rows = lane_layout(indexes, jnp.int32(-1))
    pad_mask = rows < 0

    cums = _decode_scan_sf(x0, words, rows, pad_mask, sf, T)
    coded16 = post[jnp.maximum(rows, 0), cums.astype(jnp.int32)]
    coded = (
        coded16.reshape(T, B, lanes).transpose(1, 2, 0).reshape(B, lanes * T)[:, :n]
    ).astype(jnp.int32)

    if not has_raw:
        return coded

    esc = coded == _POST_ESC
    pos = jnp.cumsum(esc, axis=1) - 1
    rows_b = jnp.broadcast_to(jnp.arange(B)[:, None], esc.shape)
    raw_vals = raw[rows_b, jnp.clip(pos, 0, raw.shape[1] - 1)]
    m = mo[indexes]
    offset = (m & _MASK16).astype(jnp.int32) - 32768
    maxv = (m >> np.uint32(16)).astype(jnp.int32)
    dec = (raw_vals >> np.uint32(1)).astype(jnp.int32)
    dec = jnp.where((raw_vals & np.uint32(1)) == 1, -dec - 1 + offset,
                    dec + maxv + offset)
    return jnp.where(esc, dec, coded)


@partial(jax.jit, static_argnames=("T", "lanes", "w_cap"))
def _encode_device_core2(symbols, indexes, cdf2, mo,
                         T: int, lanes: int, w_cap: int):
    """On-device encode with fused (start|freq) gather. Returns the packed
    (w_cap, L) word matrix + per-lane counts and the dense escape channel
    (see :func:`_encode_device_core_onehot` for the download strategy).
    Byte-compatible with :func:`_encode_device_core`."""
    B, n = symbols.shape
    m = mo[indexes]
    offset = (m & _MASK16).astype(jnp.int32) - 32768
    maxv = (m >> np.uint32(16)).astype(jnp.int32)
    value = symbols - offset
    neg = value < 0
    over = value >= maxv
    esc = neg | over
    raw = jnp.where(neg, (-2 * value - 1), 2 * (value - maxv)).astype(jnp.uint32)
    coded = jnp.where(esc, maxv, value)

    v = cdf2[indexes, coded]
    starts = v & _MASK16
    freqs = (v >> np.uint32(16)) + np.uint32(1)
    raw_counts = jnp.sum(esc, axis=1)

    pad = T * lanes - n
    L = B * lanes

    def lane_layout(a, padval):
        a = jnp.concatenate([a, jnp.full((B, pad), padval, a.dtype)], axis=1)
        return a.reshape(B, lanes, T).transpose(2, 0, 1).reshape(T, L)

    starts_tl = lane_layout(starts, jnp.uint32(0))
    freqs_tl = lane_layout(freqs, jnp.uint32(1 << 16))

    packed, counts, overflow = _encode_scan_packed(starts_tl, freqs_tl, T, w_cap)
    return packed, counts, overflow, esc, raw, raw_counts


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


def _lane_layout(n: int, lanes: int):
    T = -(-n // lanes)
    return T


def _fold_escapes(symbols, indexes, cdfs_sizes, offsets):
    """Vectorized escape folding: returns (coded_symbols, raw_values)."""
    symbols = np.asarray(symbols, np.int64).reshape(-1)
    indexes = np.asarray(indexes, np.int64).reshape(-1)
    max_value = np.asarray(cdfs_sizes, np.int64)[indexes] - 2
    value = symbols - np.asarray(offsets, np.int64)[indexes]

    neg = value < 0
    over = value >= max_value
    raw_neg = (-2 * value - 1).astype(np.uint32)
    raw_over = (2 * (value - max_value)).astype(np.uint32)

    coded = np.where(neg | over, max_value, value).astype(np.int32)
    esc = neg | over
    raw = np.where(neg, raw_neg, raw_over)[esc]
    return coded, esc, raw


def _prepare_lane_params(symbols, indexes_flat, cdfs, cdfs_sizes, offsets, lanes):
    """Per-symbol (start, freq) in lane-blocked (T, lanes) layout + raw
    escapes."""
    n = indexes_flat.size
    coded, _, raw = _fold_escapes(symbols, indexes_flat, cdfs_sizes, offsets)

    T = _lane_layout(n, lanes)
    pad = T * lanes - n
    starts_flat = cdfs[indexes_flat, coded].astype(np.uint32)
    freqs_flat = (
        cdfs[indexes_flat, coded + 1] - cdfs[indexes_flat, coded]
    ).astype(np.uint32)
    starts = np.concatenate([starts_flat, np.zeros(pad, np.uint32)])
    freqs = np.concatenate([freqs_flat, np.full(pad, 1 << 16, np.uint32)])
    # lane-blocked layout: lane l codes positions [l*T, (l+1)*T)
    return starts.reshape(lanes, T).T, freqs.reshape(lanes, T).T, raw, T


_FLAG_V2 = 1  # bit-packed per-lane counts (always set)
_FLAG_STEPMAJOR = 2  # step-major planar grid (row-sequential cores)
_FLAG_V3 = 4  # compact varint header (round 5): flags byte leads the blob


def _varint(x: int) -> bytes:
    """LEB128 unsigned varint."""
    out = bytearray()
    x = int(x)
    while True:
        b = x & 0x7F
        x >>= 7
        out.append(b | (0x80 if x else 0))
        if not x:
            return bytes(out)


def _read_varint(blob, off: int):
    val, shift = 0, 0
    while True:
        b = blob[off]
        off += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, off
        shift += 7


def pick_lanes(n: int) -> int:
    """Default lane count for an n-symbol tensor.

    Each lane costs 2 flush words + a packed count (~4.5 bytes of fixed
    overhead), so the rate-optimal lane count is as low as the scan can
    afford. Measured on TPU (tools/lane_scale_exp.py; see module docstring)
    the scan's per-step cost scales with vector width, making ~1024
    symbols/lane BOTH the fastest and near-rate-optimal point for large
    tensors: the widest power of two keeping >= ~1024 positions per lane,
    capped at ``DEFAULT_LANES``.

    Small tensors (< 128 Ki symbols — GOP latents, hyper z-latents) are
    dispatch-dominated, not width-dominated, so they target ~2048
    symbols/lane (~4096 below 32 Ki) instead: halving the lanes halves
    the fixed per-lane rate cost, which is what pushed the video
    tpu-format overhead to +12% in round 4."""
    if n >= 1024 * DEFAULT_LANES:
        return DEFAULT_LANES
    per_lane = 4096 if n < (1 << 15) else (2048 if n < (1 << 17) else 1024)
    lanes = max(1, n // per_lane)
    return 1 << (lanes.bit_length() - 1)


def _pack_header_counts(n, lanes, n_raw, counts, flags: int = 0) -> bytes:
    """v3 compact header (round 5): a leading flags byte, then LEB128
    varints for n / lanes / n_raw / count base — typically 8-10 bytes vs
    v2's fixed 17, which dominated the tpu-format rate overhead on small
    tensors (a GOP z-latent blob was ~21 bytes of framing for ~190
    symbols). Per-lane word counts stay bit-packed as base + w-bit deltas
    (LSB-first): counts are low-spread, so w is typically 5-7 bits.

    Layout: u8 flags(V2|V3|...) | varint n | varint lanes | varint n_raw |
            u8 w | varint base | packed counts[lanes x w bits]
    """
    counts = np.asarray(counts, np.int64)
    if counts.size == 0:
        base, w, delta = 0, 0, counts
    else:
        base = int(counts.min())
        delta = counts - base
        w = max(int(delta.max()).bit_length(), 0)
    parts = [
        bytes([(_FLAG_V2 | _FLAG_V3 | flags) & 0xFF]),
        _varint(n), _varint(lanes), _varint(n_raw),
        bytes([w]), _varint(base),
    ]
    if w:
        bits = (delta[:, None] >> np.arange(w)) & 1
        parts.append(np.packbits(
            bits.astype(np.uint8).reshape(-1), bitorder="little").tobytes())
    return b"".join(parts)


def _unpack_header_counts(blob: bytes):
    """Returns (n, lanes, n_raw, counts, offset_past_counts, flags)."""
    flags = blob[0]
    if not flags & _FLAG_V3 or not flags & _FLAG_V2:
        raise ValueError("unsupported tpu-format blob version (expected v3)")
    n, off = _read_varint(blob, 1)
    lanes, off = _read_varint(blob, off)
    n_raw, off = _read_varint(blob, off)
    w = blob[off]
    off += 1
    base, off = _read_varint(blob, off)
    if w:
        nbytes = (lanes * w + 7) // 8
        bits = np.unpackbits(
            np.frombuffer(blob[off : off + nbytes], dtype=np.uint8),
            count=lanes * w, bitorder="little",
        ).reshape(lanes, w)
        counts = base + (bits.astype(np.int64) << np.arange(w)).sum(axis=1)
        off += nbytes
    else:
        counts = np.full(lanes, base, np.int64)
    return n, lanes, n_raw, counts, off, flags


def _pack_raw(raw) -> bytes:
    """Bit-packed escape side channel (v3): ``u8 w | raw[n_raw x w bits]``
    (LSB-first). The v2 format spent a full u32 per escape; residuals are
    typically a few bits past the CDF support, so this is ~3 bytes saved
    per escape — the dominant tpu-format overhead on escape-heavy content
    (weakly-trained motion/residual branches)."""
    raw = np.asarray(raw, np.uint32)
    if raw.size == 0:
        return b""
    w = max(1, int(raw.max()).bit_length())
    bits = (raw[:, None] >> np.arange(w, dtype=np.uint32)) & 1
    return bytes([w]) + np.packbits(
        bits.astype(np.uint8).reshape(-1), bitorder="little"
    ).tobytes()


def _unpack_raw(blob, off: int, n_raw: int):
    if n_raw == 0:
        return np.zeros(0, np.uint32), off
    w = blob[off]
    off += 1
    nbytes = (n_raw * w + 7) // 8
    bits = np.unpackbits(
        np.frombuffer(blob[off : off + nbytes], dtype=np.uint8),
        count=n_raw * w, bitorder="little",
    ).reshape(n_raw, w)
    vals = (bits.astype(np.uint64) << np.arange(w, dtype=np.uint64)).sum(axis=1)
    return vals.astype(np.uint32), off + nbytes


def _pack_blob(n, lanes, raw, counts, per_lane_words) -> bytes:
    return b"".join([
        _pack_header_counts(n, lanes, raw.size, counts),
        np.concatenate(per_lane_words).astype("<u2").tobytes()
        if per_lane_words else b"",
        _pack_raw(raw),
    ])


def _pack_from_scan(packed_np, counts, state=None):
    """Split a (w_cap, L) compacted matrix into per-lane word vectors."""
    return [packed_np[: counts[l], l] for l in range(packed_np.shape[1])]


def encode_interleaved_batch(
    symbols, indexes, cdfs, cdfs_sizes, offsets, lanes: int = None
):
    """Encode (B, n) symbol planes in ONE device scan over B*lanes lanes.

    Returns a list of per-image blobs, byte-identical to calling
    :func:`encode_interleaved` per image.
    """
    cdfs = np.asarray(cdfs, np.int32)
    cdfs_sizes = np.asarray(cdfs_sizes, np.int32)
    offsets = np.asarray(offsets, np.int32)
    symbols = np.asarray(symbols, np.int32)
    indexes = np.asarray(indexes, np.int32)
    B, n = symbols.shape
    lanes = pick_lanes(n) if lanes is None else lanes

    starts_l, freqs_l, raws = [], [], []
    for b in range(B):
        s, f, raw, T = _prepare_lane_params(
            symbols[b], indexes[b].reshape(-1), cdfs, cdfs_sizes, offsets, lanes
        )
        starts_l.append(s)
        freqs_l.append(f)
        raws.append(raw)
    starts = np.concatenate(starts_l, axis=1)  # (T, B*lanes)
    freqs = np.concatenate(freqs_l, axis=1)

    w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)
    packed, counts, overflow = _encode_scan_packed(
        jnp.asarray(starts), jnp.asarray(freqs), T, w_cap
    )
    if bool(overflow):
        # pathological stream: fall back to per-image dense path
        return [
            encode_interleaved(
                symbols[b], indexes[b], cdfs, cdfs_sizes, offsets, lanes
            )
            for b in range(B)
        ]
    packed_np = np.asarray(packed).astype(np.uint16)
    counts = np.asarray(counts).astype(np.int64)

    blobs = []
    for b in range(B):
        sl = slice(b * lanes, (b + 1) * lanes)
        words = [packed_np[: counts[l], l] for l in range(b * lanes, (b + 1) * lanes)]
        blobs.append(_pack_blob(n, lanes, raws[b], counts[sl], words))
    return blobs


def decode_interleaved_batch(
    blobs, indexes, cdfs, cdfs_sizes, offsets, lut=None
) -> np.ndarray:
    """Decode B per-image blobs in ONE device scan. indexes: (B, ...)."""
    cdfs = np.asarray(cdfs, np.int32)
    cdfs_sizes = np.asarray(cdfs_sizes, np.int32)
    offsets = np.asarray(offsets, np.int32)
    indexes = np.asarray(indexes, np.int32)
    B = len(blobs)
    shape = indexes.shape
    n = indexes.reshape(B, -1).shape[1]

    unpacked = [_unpack_blob(blob, n) for blob in blobs]
    lanes = unpacked[0][0]
    T = _lane_layout(n, lanes)
    if any(u[0] != lanes for u in unpacked):
        raise ValueError("inconsistent lane counts across blobs")

    max_w = max(1, max(int((u[1] - 2).max()) for u in unpacked))
    max_w = 1 << (max_w - 1).bit_length()  # bound jit recompiles
    total_lanes = B * lanes
    x0 = np.empty(total_lanes, np.uint32)
    words = np.zeros((max_w, total_lanes), np.uint32)
    for b, (lns, counts, stream, raw, _fl) in enumerate(unpacked):
        bounds = np.concatenate([[0], np.cumsum(counts)])
        for l in range(lanes):
            s = stream[bounds[l] : bounds[l + 1]]
            x0[b * lanes + l] = np.uint32(s[0]) | (np.uint32(s[1]) << 16)
            words[: s.size - 2, b * lanes + l] = s[2:]

    rows_l = []
    pad_l = []
    for b in range(B):
        idx_flat = indexes.reshape(B, -1)[b]
        pad = T * lanes - n
        rows = np.concatenate([idx_flat, np.full(pad, -1, np.int32)])
        rows_l.append(rows.reshape(lanes, T).T)
        pad_l.append(rows_l[-1] < 0)
    rows = np.concatenate(rows_l, axis=1)
    pad_mask = np.concatenate(pad_l, axis=1)

    if lut is None:
        lut = build_decode_lut(cdfs, cdfs_sizes)

    syms = np.asarray(
        _decode_scan(
            jnp.asarray(x0), jnp.asarray(words), jnp.asarray(rows),
            jnp.asarray(pad_mask), jnp.asarray(lut), jnp.asarray(cdfs), T,
        )
    )

    out = np.empty((B, n), np.int32)
    for b in range(B):
        coded = syms[:, b * lanes : (b + 1) * lanes].T.reshape(-1)[:n]
        out[b] = _unfold_escapes(
            coded, indexes.reshape(B, -1)[b], cdfs_sizes, offsets, unpacked[b][3]
        )
    return out.reshape(shape)


def _unpack_blob(blob: bytes, n_expected: int):
    n, lanes, n_raw, counts, off, flags = _unpack_header_counts(blob)
    if n != n_expected:
        raise ValueError(f"blob holds {n} symbols, indexes imply {n_expected}")
    total_words = int(counts.sum())
    stream = np.frombuffer(blob[off : off + 2 * total_words], dtype="<u2")
    off += 2 * total_words
    raw, off = _unpack_raw(blob, off, n_raw)
    return lanes, counts, stream, raw, flags


def _unfold_escapes(coded, indexes_flat, cdfs_sizes, offsets, raw):
    max_value = cdfs_sizes[indexes_flat] - 2
    esc = coded == max_value
    values = coded.astype(np.int64)
    if raw.size:
        raw_vals = raw[np.cumsum(esc)[esc] - 1].astype(np.int64)
        dec = raw_vals >> 1
        dec = np.where(raw_vals & 1, -dec - 1, dec + max_value[esc])
        values[esc] = dec
    return (values + offsets[indexes_flat]).astype(np.int32)


def encode_interleaved(
    symbols, indexes, cdfs, cdfs_sizes, offsets, lanes: int = None
) -> bytes:
    """Encode one tensor into the interleaved-lane blob format."""
    cdfs = np.asarray(cdfs, np.int32)
    cdfs_sizes = np.asarray(cdfs_sizes, np.int32)
    offsets = np.asarray(offsets, np.int32)
    indexes_flat = np.asarray(indexes, np.int32).reshape(-1)
    n = indexes_flat.size
    lanes = pick_lanes(n) if lanes is None else lanes

    starts, freqs, raw, T = _prepare_lane_params(
        np.asarray(symbols, np.int32).reshape(-1), indexes_flat,
        cdfs, cdfs_sizes, offsets, lanes,
    )

    # device encode + compaction; w_cap sized for <=~10 bits/symbol with a
    # dense-emission fallback for pathological streams
    w_cap = max(8, (T * 10) // 16 + 4)
    packed, counts, overflow = _encode_scan_packed(
        jnp.asarray(starts), jnp.asarray(freqs), T, min(w_cap, T + 2)
    )
    if bool(overflow):
        words, valid, state = _encode_scan(
            jnp.asarray(starts), jnp.asarray(freqs), T
        )
        words = np.asarray(words).astype(np.uint16)
        valid = np.asarray(valid)
        state = np.asarray(state, np.uint32)
        counts = valid.sum(axis=0).astype(np.int64) + 2
        streams = []
        for l in range(lanes):
            lane_words = words[valid[:, l], l]
            streams.append(
                np.concatenate([
                    np.array(
                        [state[l] & 0xFFFF, state[l] >> 16], dtype=np.uint16
                    ),
                    lane_words,
                ])
            )
        stream = np.concatenate(streams) if streams else np.zeros(0, np.uint16)
    else:
        packed_np = np.asarray(packed).astype(np.uint16)  # (w_cap, L)
        counts = np.asarray(counts).astype(np.int64)
        stream = np.concatenate(
            [packed_np[: counts[l], l] for l in range(lanes)]
        ) if lanes else np.zeros(0, np.uint16)

    blob = b"".join([
        _pack_header_counts(n, lanes, raw.size, counts),
        stream.astype("<u2").tobytes(),
        _pack_raw(raw),
    ])
    return blob


def decode_interleaved(
    blob: bytes, indexes, cdfs, cdfs_sizes, offsets, lut=None
) -> np.ndarray:
    """Decode a blob back to symbols shaped like ``indexes``."""
    cdfs = np.asarray(cdfs, np.int32)
    cdfs_sizes = np.asarray(cdfs_sizes, np.int32)
    offsets = np.asarray(offsets, np.int32)
    indexes = np.asarray(indexes, np.int32)
    shape = indexes.shape
    indexes_flat = indexes.reshape(-1)

    n, lanes, n_raw, counts, off, _flags = _unpack_header_counts(blob)
    if n != indexes_flat.size:
        raise ValueError(f"blob holds {n} symbols, indexes imply {indexes_flat.size}")
    total_words = int(counts.sum())
    stream = np.frombuffer(blob[off : off + 2 * total_words], dtype="<u2")
    off += 2 * total_words
    raw, off = _unpack_raw(blob, off, n_raw)

    # unpack per-lane streams into an (W, L) padded matrix + init states
    T = _lane_layout(n, lanes)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    x0 = np.empty(lanes, np.uint32)
    max_w = max(1, int((counts - 2).max()) if lanes else 1)
    words = np.zeros((max_w, lanes), np.uint32)
    for l in range(lanes):
        s = stream[bounds[l] : bounds[l + 1]]
        x0[l] = np.uint32(s[0]) | (np.uint32(s[1]) << 16)
        lane_words = s[2:]
        words[: lane_words.size, l] = lane_words

    pad = T * lanes - n
    rows = np.concatenate([indexes_flat, np.full(pad, -1, np.int32)])
    rows = rows.reshape(lanes, T).T
    pad_mask = rows < 0

    if lut is None:
        lut = build_decode_lut(cdfs, cdfs_sizes)

    syms = np.asarray(
        _decode_scan(
            jnp.asarray(x0),
            jnp.asarray(words),
            jnp.asarray(rows),
            jnp.asarray(pad_mask),
            jnp.asarray(lut),
            jnp.asarray(cdfs),
            T,
        )
    )
    coded = syms.T.reshape(-1)[:n]  # undo lane-blocked layout

    # unfold escapes from the raw side channel
    max_value = cdfs_sizes[indexes_flat] - 2
    esc = coded == max_value
    values = coded.astype(np.int64)
    if n_raw:
        raw_vals = raw[np.cumsum(esc)[esc] - 1].astype(np.int64)
        dec = raw_vals >> 1
        dec = np.where(raw_vals & 1, -dec - 1, dec + max_value[esc])
        values[esc] = dec
    out = (values + offsets[indexes_flat]).astype(np.int32)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Device-resident batch API: symbols stay on device; only entropy-sized
# packed streams cross the host boundary.
# ---------------------------------------------------------------------------


class EncodeDeviceHandle:
    """Two-phase device encode: construction dispatches all device work and
    starts async host copies of the (small) per-lane counts; ``result()``
    fetches the entropy-sized stream and packs blobs. Interleaving several
    handles overlaps chunk i's D2H with chunk i+1's compute — device work is
    queued asynchronously, only ``result()`` blocks."""

    def __init__(self, symbols_dev, indexes_dev, tables,
                 lanes: int = None):
        B, n = symbols_dev.shape
        lanes = pick_lanes(n) if lanes is None else lanes
        self._B, self._n, self._lanes = B, n, lanes
        self._tables = tables
        self._symbols = symbols_dev
        self._indexes = indexes_dev
        T = _lane_layout(n, lanes)
        self._w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)
        ct = tables.device_compact
        pt = None if ct is not None else tables.device_packed
        self._pt = ct if ct is not None else pt
        if ct is not None:
            out = _encode_device_core_onehot(
                symbols_dev, indexes_dev, ct["enc_hi"], ct["enc_lo"],
                T, lanes, self._w_cap,
            )
        elif pt is not None:
            out = _encode_device_core2(
                symbols_dev, indexes_dev, pt["cdf2"], pt["mo"],
                T, lanes, self._w_cap,
            )
        if self._pt is not None:
            (self._packed, self._counts, self._overflow, self._esc,
             self._raw_dense, self._raw_counts) = out
            for a in (self._counts, self._raw_counts, self._overflow):
                a.copy_to_host_async()

    @classmethod
    def from_core_outputs(cls, out, symbols_dev, indexes_fn, tables, n: int,
                          lanes: int, w_cap: int):
        """Wrap precomputed ``_encode_device_core_onehot`` outputs (from a
        caller-fused jit that also ran the transform — one dispatch instead
        of 3+, each a full tunnel RTT on the dev link). ``symbols_dev`` and
        the zero-arg ``indexes_fn`` are used only by the rare overflow
        fallback."""
        self = object.__new__(cls)
        (self._packed, self._counts, self._overflow, self._esc,
         self._raw_dense, self._raw_counts) = out
        B = self._esc.shape[0]
        self._B, self._n, self._lanes = B, n, lanes
        self._w_cap = w_cap
        self._tables = tables
        self._symbols = symbols_dev
        self._indexes = indexes_fn
        self._pt = tables.device_compact
        assert self._pt is not None
        for a in (self._counts, self._raw_counts, self._overflow):
            a.copy_to_host_async()
        return self

    def result(self):
        if self._pt is None:
            return encode_batch_device_generic(
                self._symbols, self._indexes, self._tables, self._lanes
            )
        B, n, lanes = self._B, self._n, self._lanes
        tables = self._tables
        counts_np = np.asarray(self._counts).astype(np.int64)
        fallback_blobs, fallback_idx = None, None
        if bool(self._overflow):
            retry = getattr(self, "_retry", None)
            if retry is not None:
                # row-sequential path: re-dispatch at full word capacity
                # (counts <= T + 2 always, so this cannot overflow)
                (self._packed, self._counts, self._overflow, self._esc,
                 self._raw_dense, self._raw_counts), self._w_cap = retry()
                counts_np = np.asarray(self._counts).astype(np.int64)
            else:
                # Host re-encode ONLY the images whose lanes overflowed
                # w_cap — a fused GOP encode folds many frames into one
                # handle, and a whole-batch fallback would silently
                # re-encode the entire GOP on host for one pathological
                # frame (round-4 advisor finding). Per-image overflow is
                # recomputed from the counts; bytes are identical either
                # way (encode_interleaved_batch is the same format).
                # coding_cdf == quantized_cdf unless folding is active; the
                # host fallback must code with the same tables as the
                # device cores.
                ovf_img = (
                    counts_np.reshape(B, lanes) > self._w_cap
                ).any(axis=1)
                fallback_idx = np.where(ovf_img)[0]
                if fallback_idx.size:
                    indexes = (
                        self._indexes() if callable(self._indexes)
                        else self._indexes
                    )
                    symbols_np = np.asarray(self._symbols)
                    indexes_np = np.asarray(indexes)
                    fallback_blobs = encode_interleaved_batch(
                        symbols_np[fallback_idx], indexes_np[fallback_idx],
                        tables.coding_cdf, tables.cdf_length, tables.offset,
                        lanes,
                    )
                    if fallback_idx.size == B:
                        return fallback_blobs
                    # clamp so packing stays aligned; the clamped images'
                    # blobs are replaced with their host re-encodes below
                    counts_np = np.minimum(counts_np, self._w_cap)
        raw_counts_np = np.asarray(self._raw_counts).astype(np.int64)
        max_raw = int(raw_counts_np.max()) if B else 0
        if max_raw:
            # rare path (out-of-table symbols): compact the escape side
            # channel on device, pow2-bucketed for jit-cache stability
            rb = 1 << (max_raw - 1).bit_length()
            raw_np = np.asarray(_raw_compact(self._esc, self._raw_dense, rb))
        else:
            raw_np = np.zeros((B, 0), np.uint32)
        # short-slice download + vectorized host trim: D2H is
        # max(words/lane) * lanes * 2 bytes, and skipping the on-device
        # flat-concatenation scatter saves ~56 ms / 24 Kodak-size images
        # (tools/encode_core_exp.py E5); pow2 bucketing keeps one compiled
        # slice program across stream sizes
        cap_w = min(1 << (max(2, int(counts_np.max())) - 1).bit_length(),
                    self._w_cap)
        packed_np = np.asarray(_slice_packed(self._packed, cap_w))
        mask = np.arange(cap_w)[:, None] < counts_np[None, :]
        flat = packed_np.T[mask.T]  # per-lane words, lane-major, ascending
        blobs = _pack_device_blobs(
            B, n, lanes, counts_np, flat, raw_np, raw_counts_np,
            getattr(self, "_flags", 0),
        )
        if fallback_blobs is not None:
            for j, b in enumerate(fallback_idx):
                blobs[b] = fallback_blobs[j]
        return blobs


def _pack_device_blobs(B, n, lanes, counts_np, flat, raw_np, raw_counts_np,
                       flags: int = 0):
    lane_bounds = np.concatenate([[0], np.cumsum(counts_np)])
    blobs = []
    for b in range(B):
        lo = lane_bounds[b * lanes]
        hi = lane_bounds[(b + 1) * lanes]
        blobs.append(b"".join([
            _pack_header_counts(
                n, lanes, raw_counts_np[b],
                counts_np[b * lanes : (b + 1) * lanes], flags,
            ),
            flat[lo:hi].astype("<u2").tobytes(),
            _pack_raw(raw_np[b, : raw_counts_np[b]]),
        ]))
    return blobs


def encode_batch_device(symbols_dev, indexes_dev, tables, lanes: int = None):
    """Encode (B, n) device symbol/index arrays into per-image blobs.

    Byte-identical to :func:`encode_interleaved_batch` on the same inputs.
    Uses the packed-table core (one fused (start|freq) gather, on-device
    stream compaction, entropy-sized download) when the tables fit the
    packed ranges; else the generic core.
    """
    return EncodeDeviceHandle(symbols_dev, indexes_dev, tables, lanes).result()


def encode_batch_device_generic(symbols_dev, indexes_dev, tables,
                                lanes: int = None):
    """Generic-table fallback for :func:`encode_batch_device`."""
    B, n = symbols_dev.shape
    lanes = pick_lanes(n) if lanes is None else lanes
    T = _lane_layout(n, lanes)
    w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)
    raw_cap = max(256, n // 32)
    dev = tables.device
    packed, counts, overflow, raw, raw_counts, raw_ovf = _encode_device_core(
        symbols_dev, indexes_dev, dev["cdf"], dev["sizes"], dev["offsets"],
        T, lanes, w_cap, raw_cap,
    )
    if bool(overflow) or bool(raw_ovf):
        # pathological stream: host fallback (generic path => gates failed
        # => coding_cdf is the unfolded quantized_cdf, matching dev["cdf"])
        return encode_interleaved_batch(
            np.asarray(symbols_dev), np.asarray(indexes_dev),
            tables.coding_cdf, tables.cdf_length, tables.offset, lanes,
        )

    packed_np = np.asarray(packed)  # (w_cap, B*lanes) uint16
    counts_np = np.asarray(counts).astype(np.int64)
    raw_np = np.asarray(raw)
    raw_counts_np = np.asarray(raw_counts).astype(np.int64)

    # vectorized per-lane trim: column-major mask selection keeps
    # per-lane words contiguous in ascending order
    mask = np.arange(w_cap)[:, None] < counts_np[None, :]
    flat = packed_np.T[mask.T]  # concatenated per-lane words, lane-major
    return _pack_device_blobs(B, n, lanes, counts_np, flat, raw_np, raw_counts_np)


def prepare_decode_blobs(blobs, n: int) -> dict:
    """Host-side decode prep shared by :func:`decode_batch_device` and the
    callers that fuse the decode core into a larger jit (entropy decode +
    synthesis transform in ONE dispatch): unpack blob headers, build the
    padded flat word stream, per-lane counts and the escape channel, and
    derive the pow2-bucketed static shapes (stable jit signatures)."""
    B = len(blobs)
    unpacked = [_unpack_blob(blob, n) for blob in blobs]
    lanes = unpacked[0][0]
    T = _lane_layout(n, lanes)

    counts_all = np.concatenate([u[1] for u in unpacked])
    body = counts_all - 2
    max_w = max(1, int(body.max()))
    max_w = 1 << (max_w - 1).bit_length()
    # _expand_stream precondition (cheap host-side check; see its docstring)
    assert int(counts_all.max(initial=0)) <= max_w + 2

    # power-of-two bucketed capacities keep the jit signature stable across
    # bitstream sizes (a raw `total`-sized shape would recompile per call)
    raw_cap = max(1, max(int(u[3].size) for u in unpacked))
    raw_cap = 1 << (raw_cap - 1).bit_length()
    has_raw = any(u[3].size for u in unpacked)
    raw = np.zeros((B, raw_cap), np.uint32)
    raw_counts = np.zeros(B, np.int64)
    for b, u in enumerate(unpacked):
        raw[b, : u[3].size] = u[3]
        raw_counts[b] = u[3].size

    stream_concat = np.concatenate([u[2] for u in unpacked])
    total = int(counts_all.sum())
    cap = -(-total // 65536) * 65536
    stream_all = np.zeros(cap, np.uint16)
    stream_all[:total] = stream_concat
    stepmajor = bool(unpacked[0][4] & _FLAG_STEPMAJOR)
    assert all(bool(u[4] & _FLAG_STEPMAJOR) == stepmajor for u in unpacked)
    return {
        "unpacked": unpacked, "lanes": lanes, "T": T,
        "counts_all": counts_all, "max_w": max_w,
        "raw": raw, "raw_counts": raw_counts, "has_raw": has_raw,
        "stream_all": stream_all, "stream_concat": stream_concat,
        "stepmajor": stepmajor,
    }


def decode_batch_device(blobs, indexes_dev, tables, lanes: int = None,
                        sharding=None):
    """Decode per-image blobs to a (B, n) int32 symbol array ON DEVICE.

    With packed tables the host only concatenates the raw blob words and
    uploads the entropy-sized flat stream; lane expansion, the scan, symbol
    recovery and escape unfolding are all fused on device.

    ``sharding``: optional ``NamedSharding`` with the batch axis sharded
    (e.g. ``P("dp")``); the per-image index/lane layout is placed with it so
    XLA partitions the decode scan and symbol recovery across the mesh (the
    lane axis carries the batch sharding — images are independent streams).
    The flat word stream and tables stay replicated (entropy-sized).
    """
    if sharding is not None:
        indexes_dev = jax.device_put(np.asarray(indexes_dev), sharding)
    else:
        indexes_dev = jnp.asarray(indexes_dev)
    B, n = indexes_dev.shape
    prep = prepare_decode_blobs(blobs, n)
    if prep["stepmajor"]:
        raise ValueError(
            "step-major blobs must be decoded through decode_rowseq_batch"
        )
    unpacked, lanes, T = prep["unpacked"], prep["lanes"], prep["T"]
    counts_all, max_w = prep["counts_all"], prep["max_w"]
    raw, raw_counts, has_raw = prep["raw"], prep["raw_counts"], prep["has_raw"]

    ct = tables.device_compact
    if ct is not None:
        return _decode_device_core_onehot(
            jnp.asarray(prep["stream_all"]),
            jnp.asarray(counts_all.astype(np.int32)),
            indexes_dev, jnp.asarray(raw),
            ct["dec_hi"], ct["dec_lo"], T, lanes, max_w, has_raw,
        )

    pt = tables.device_packed
    if pt is not None:
        return _decode_device_core2(
            jnp.asarray(prep["stream_all"]),
            jnp.asarray(counts_all.astype(np.int32)),
            indexes_dev, jnp.asarray(raw), jnp.asarray(raw_counts),
            pt["sf"], pt["post"], pt["mo"], T, lanes, max_w, has_raw,
        )

    # generic fallback: vectorized host unpack of all lanes into
    # (max_w, B*lanes) + init states
    total_lanes = B * lanes
    body = counts_all - 2
    stream_all = prep["stream_concat"]
    bounds = np.concatenate([[0], np.cumsum(counts_all)])[:-1]
    x0 = (
        stream_all[bounds].astype(np.uint32)
        | (stream_all[bounds + 1].astype(np.uint32) << 16)
    )
    total_body = int(body.sum())
    lane_of = np.repeat(np.arange(total_lanes), body)
    j_of = np.arange(total_body) - np.repeat(np.cumsum(body) - body, body)
    src = np.repeat(bounds + 2, body) + j_of
    words = np.zeros((max_w, total_lanes), np.uint16)
    words[j_of, lane_of] = stream_all[src]

    dev = tables.device
    if "lut" not in dev:  # low-memory mode: binary-search decode
        stride = int(dev["cdf_search"].shape[1])
        k_steps = max(1, (stride - 1).bit_length())
        return _decode_device_core_search(
            jnp.asarray(x0), jnp.asarray(words), indexes_dev,
            jnp.asarray(raw), jnp.asarray(raw_counts),
            dev["cdf_search"], dev["cdf"], dev["sizes"], dev["offsets"],
            T, lanes, k_steps,
        )
    return _decode_device_core(
        jnp.asarray(x0), jnp.asarray(words), indexes_dev,
        jnp.asarray(raw), jnp.asarray(raw_counts),
        dev["lut"], dev["cdf"], dev["sizes"], dev["offsets"], T, lanes,
    )


# ---------------------------------------------------------------------------
# Row-sequential host entry points
# ---------------------------------------------------------------------------


def blob_flags(blob: bytes) -> int:
    return blob[0]


def encode_rowseq_async(symbols_planar_dev, n_channels: int, hw: int,
                        tables, lanes: int = None):
    """Dispatch the step-major encode for PLANAR (channel-major) (B, n)
    device symbols; returns an :class:`EncodeDeviceHandle`. Caller must have
    checked ``rowseq_lanes(n, hw)`` and ``tables.device_rowseq``."""
    B, n = symbols_planar_dev.shape
    lanes = rowseq_lanes(n, hw) if lanes is None else lanes
    T = n // lanes
    w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)
    rt = tables.device_rowseq
    rows_t = jnp.asarray(rowseq_schedule(n_channels, hw, lanes))

    def run(cap):
        return _encode_device_core_rowseq(
            symbols_planar_dev, rows_t, rt["start"], rt["freq"],
            rt["off"], rt["maxv"], rt["k"], T, lanes, cap,
        )

    handle = EncodeDeviceHandle.from_core_outputs(
        run(w_cap), symbols_planar_dev, None, tables, n, lanes, w_cap,
    )
    handle._flags = _FLAG_STEPMAJOR
    handle._retry = lambda: (run(T + 2), T + 2)
    return handle


def decode_rowseq_batch(blobs, n_channels: int, hw: int, tables):
    """Decode step-major blobs to (B, n) int32 PLANAR symbols on device."""
    n = n_channels * hw
    prep = prepare_decode_blobs(blobs, n)
    if not prep["stepmajor"]:
        raise ValueError("blobs are not step-major; use decode_batch_device")
    lanes, T = prep["lanes"], prep["T"]
    rt = tables.device_rowseq
    rows_t = jnp.asarray(rowseq_schedule(n_channels, hw, lanes))
    return _decode_device_core_rowseq(
        jnp.asarray(prep["stream_all"]),
        jnp.asarray(prep["counts_all"].astype(np.int32)),
        rows_t, jnp.asarray(prep["raw"]),
        rt["search"], rt["off"], rt["maxv"], rt["k"],
        T, lanes, prep["max_w"], prep["has_raw"],
    )
