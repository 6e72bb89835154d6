"""Sort-based stream compaction/expansion experiments.

Round-3 follow-up to tools/encode_core_exp.py. The two remaining
latency-serialized data movements in the coder hot path are scatters and
gathers over the word streams:

  - encode: `_encode_scan_packed` compacts the dense (T, L) emission matrix
    with a scatter (E2 - E1 measured ~40 ms for 24 Kodak-size images);
  - decode: `_expand_stream` builds the per-lane word queue with a computed
    gather over the flat uploaded stream (D1 measured ~30 ms).

Both are permutations, and XLA's TPU sort is a fully vectorized bitonic
network — a sort-by-destination-key replaces the serialized scatter, a
double sort (align with source order, restore slot order) replaces the
gather. Variants:

  S0   `_encode_scan_packed` (scan + scatter compaction) — baseline
  S1   scan + fused-u32 single-operand sort compaction
       (key<<16 | word per element, sorted along T; needs 2T < 2^16)
  S1b  scan + two-operand (key, word) sort compaction (no T limit)
  X0   `_expand_stream` (computed gather) — baseline
  X1   double-sort expansion: sort slot-ids by source index, zip with the
       flat stream, sort back by slot-id
  R0   `_raw_compact` scatter — baseline (escape channel)
  R1   sort-based raw compaction

Each variant is verified element-exact against its baseline before timing.
Run on the TPU: `timeout 900 python tools/sort_compact_exp.py`.
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from compressai_environment_tpu.entropy import vrans
from tools.decode_core_exp import build_workload, timed


# ---------------------------------------------------------------------------
# S1: sort-based encode compaction
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("T", "w_cap"))
def encode_scan_sortpack_fused(starts, freqs, T: int, w_cap: int):
    """Like `_encode_scan_packed` but compaction is a single-operand sort:
    each (t, lane) element becomes key<<16 | word with key = t for valid
    emissions and T + t for invalid ones, so an ascending sort along T puts
    the valid words first in t order. Requires 2T <= 2^16."""
    words, valid, state = vrans._encode_scan(starts, freqs, T)
    t_iota = jnp.arange(T, dtype=jnp.uint32)[:, None]
    key = jnp.where(valid, t_iota, t_iota + np.uint32(T))
    fused = (key << np.uint32(16)) | words
    fused = jax.lax.sort(fused, dimension=0)
    body = (fused[: w_cap - 2] & np.uint32(0xFFFF)) if w_cap - 2 <= T else (
        jnp.concatenate(
            [fused & np.uint32(0xFFFF),
             jnp.zeros((w_cap - 2 - T, fused.shape[1]), jnp.uint32)]
        )
    )
    packed = jnp.concatenate(
        [(state & np.uint32(0xFFFF))[None], (state >> np.uint32(16))[None],
         body]
    )
    counts = valid.sum(axis=0).astype(jnp.int32) + 2
    overflow = jnp.any(counts > w_cap)
    return packed, counts, overflow


@partial(jax.jit, static_argnames=("T", "w_cap"))
def encode_scan_sortpack_two(starts, freqs, T: int, w_cap: int):
    """Two-operand (key, word) sort compaction — no T range limit."""
    words, valid, state = vrans._encode_scan(starts, freqs, T)
    t_iota = jnp.arange(T, dtype=jnp.int32)[:, None]
    key = jnp.where(valid, t_iota, t_iota + T)
    key = jnp.broadcast_to(key, words.shape)
    _, sorted_words = jax.lax.sort((key, words), dimension=0, num_keys=1)
    body = sorted_words[: w_cap - 2] if w_cap - 2 <= T else jnp.concatenate(
        [sorted_words,
         jnp.zeros((w_cap - 2 - T, words.shape[1]), jnp.uint32)]
    )
    packed = jnp.concatenate(
        [(state & np.uint32(0xFFFF))[None], (state >> np.uint32(16))[None],
         body]
    )
    counts = valid.sum(axis=0).astype(jnp.int32) + 2
    overflow = jnp.any(counts > w_cap)
    return packed, counts, overflow


# ---------------------------------------------------------------------------
# X1: double-sort stream expansion
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_w",))
def expand_stream_sort(flat, counts, max_w: int):
    """Gather-free `_expand_stream`: slots (j, lane) with j in [0, max_w+2)
    draw from flat position bounds[lane] + j when j < counts[lane]. Sorting
    slot ids by that source key aligns them with the flat stream order;
    sorting the (slot, word) pairs back by slot id yields the dense
    (max_w+2, L) matrix without a computed gather or scatter."""
    cap = flat.shape[0]
    L = counts.shape[0]
    n_slots = (max_w + 2) * L
    flat32 = flat.astype(jnp.uint32)

    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    j = jnp.arange(max_w + 2, dtype=jnp.int32)[:, None]
    src = jnp.where(j < counts[None, :], bounds[None, :] + j, cap).reshape(-1)
    slot = jnp.arange(n_slots, dtype=jnp.int32)
    _, slot_by_src = jax.lax.sort((src, slot), dimension=0, num_keys=1)

    flat_pad = jnp.concatenate(
        [flat32, jnp.zeros((n_slots - cap,), jnp.uint32)]
    ) if n_slots > cap else flat32[:n_slots]
    _, words = jax.lax.sort((slot_by_src, flat_pad), dimension=0, num_keys=1)
    words = words.reshape(max_w + 2, L)

    x0 = words[0] | (words[1] << np.uint32(16))
    # lanes with counts < 2 never occur (every lane carries 2 state words)
    buf = words[2:]
    return x0, buf


# ---------------------------------------------------------------------------
# R1: sort-based raw escape compaction
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("raw_cap",))
def raw_compact_sort(esc, raw, raw_cap: int):
    n = esc.shape[1]
    pos = jnp.arange(n, dtype=jnp.int32)[None, :]
    key = jnp.where(esc, pos, pos + n)
    key = jnp.broadcast_to(key, raw.shape)
    _, sorted_raw = jax.lax.sort(
        (key, jnp.where(esc, raw, 0)), dimension=1, num_keys=1
    )
    out = sorted_raw[:, :raw_cap] if raw_cap <= n else jnp.concatenate(
        [sorted_raw, jnp.zeros((esc.shape[0], raw_cap - n), raw.dtype)], axis=1
    )
    valid = jnp.arange(raw_cap)[None, :] < jnp.sum(esc, axis=1)[:, None]
    return jnp.where(valid, out, 0)


def main():
    tables, symbols, indexes, lanes = build_workload()
    B, n = symbols.shape
    T = -(-n // lanes)
    L = B * lanes
    w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)
    print(f"workload: B={B} n={n} T={T} L={L} w_cap={w_cap}")

    symbols_dev = jnp.asarray(symbols)
    indexes_dev = jnp.asarray(indexes)
    ct = tables.device_compact
    assert ct is not None

    # (starts, freqs) via the shipped one-hot stage
    out = vrans._encode_device_core_onehot(
        symbols_dev, indexes_dev, ct["enc_hi"], ct["enc_lo"], T, lanes, w_cap
    )
    jax.block_until_ready(out)

    enc_hi, enc_lo = ct["enc_hi"], ct["enc_lo"]
    R = enc_hi.shape[0]
    S1 = (enc_hi.shape[1] - 2) // 2

    @jax.jit
    def onehot_stage(symbols, indexes):
        def per_image(args):
            sym, idx = args
            ext = vrans._exact_select(vrans._onehot_rows(idx, R), enc_hi, enc_lo)
            off = ext[:, -2].astype(jnp.int32) - 32768
            maxv = ext[:, -1].astype(jnp.int32)
            value = sym - off
            esc = (value < 0) | (value >= maxv)
            coded = jnp.where(esc, maxv, value)
            colsel = (coded[:, None] == jnp.arange(S1, dtype=jnp.int32)
                      ).astype(jnp.float32)
            start = jnp.sum(ext[:, :S1] * colsel, axis=1)
            freq = jnp.sum(ext[:, S1:2 * S1] * colsel, axis=1)
            return start.astype(jnp.uint32), freq.astype(jnp.uint32)

        return jax.lax.map(per_image, (symbols, indexes))

    starts, freqs = onehot_stage(symbols_dev, indexes_dev)
    pad = T * lanes - n

    @jax.jit
    def lane_layout2(starts, freqs):
        def ll(a, padval):
            a = jnp.concatenate([a, jnp.full((B, pad), padval, a.dtype)], axis=1)
            return a.reshape(B, lanes, T).transpose(2, 0, 1).reshape(T, L)
        return ll(starts, jnp.uint32(0)), ll(freqs, jnp.uint32(1 << 16))

    starts_tl, freqs_tl = lane_layout2(starts, freqs)
    jax.block_until_ready((starts_tl, freqs_tl))

    dt_scan, _ = timed(lambda: vrans._encode_scan(starts_tl, freqs_tl, T))
    print(f"E1 dense encode scan:            {dt_scan:8.1f} ms")

    dt0, (p0, c0, o0) = timed(
        lambda: vrans._encode_scan_packed(starts_tl, freqs_tl, T, w_cap))
    print(f"S0 scan + scatter compaction:    {dt0:8.1f} ms"
          f"   (compaction {dt0 - dt_scan:.1f})")

    assert 2 * T < (1 << 16)
    dt1, (p1, c1, o1) = timed(
        lambda: encode_scan_sortpack_fused(starts_tl, freqs_tl, T, w_cap))
    print(f"S1 scan + fused-sort compaction: {dt1:8.1f} ms"
          f"   (compaction {dt1 - dt_scan:.1f})")

    dt1b, (p1b, c1b, o1b) = timed(
        lambda: encode_scan_sortpack_two(starts_tl, freqs_tl, T, w_cap))
    print(f"S1b scan + 2-op sort compaction: {dt1b:8.1f} ms"
          f"   (compaction {dt1b - dt_scan:.1f})")

    # exactness: packed rows agree wherever < counts
    p0n, c0n = np.asarray(p0), np.asarray(c0)
    for name, p, c in (("S1", p1, c1), ("S1b", p1b, c1b)):
        pn, cn = np.asarray(p), np.asarray(c)
        assert (cn == c0n).all()
        mask = np.arange(p0n.shape[0])[:, None] < c0n[None, :]
        assert (np.where(mask, pn & 0xFFFF, 0) == np.where(mask, p0n & 0xFFFF, 0)).all(), name
    print("S1/S1b exactness: OK")

    # ----- decode expansion -----
    blobs = vrans.encode_batch_device(symbols_dev, indexes_dev, tables)
    unpacked = [vrans._unpack_blob(b, n) for b in blobs]
    counts_all = np.concatenate([u[1] for u in unpacked])
    body = counts_all - 2
    max_w = 1 << (max(1, int(body.max())) - 1).bit_length()
    total = int(counts_all.sum())
    cap = -(-total // 65536) * 65536
    stream_all = np.zeros(cap, np.uint16)
    stream_all[:total] = np.concatenate([u[2] for u in unpacked])
    stream_dev = jnp.asarray(stream_all)
    counts_dev = jnp.asarray(counts_all.astype(np.int32))

    expand = jax.jit(vrans._expand_stream, static_argnames=("max_w",))
    dtx0, (x0_g, buf_g) = timed(lambda: expand(stream_dev, counts_dev, max_w))
    print(f"X0 gather _expand_stream:        {dtx0:8.1f} ms "
          f"(max_w={max_w}, L={L})")

    dtx1, (x0_s, buf_s) = timed(
        lambda: expand_stream_sort(stream_dev, counts_dev, max_w))
    print(f"X1 double-sort expansion:        {dtx1:8.1f} ms")

    assert (np.asarray(x0_g) == np.asarray(x0_s)).all()
    bg, bs = np.asarray(buf_g), np.asarray(buf_s)
    mask = np.arange(max_w)[:, None] < (counts_all - 2)[None, :]
    assert (np.where(mask, bs, 0) == np.where(mask, bg, 0)).all()
    print("X1 exactness: OK")

    # ----- raw escape compaction -----
    rng = np.random.default_rng(1)
    esc_np = rng.random((B, n)) < 0.01
    raw_np = rng.integers(0, 1 << 20, (B, n)).astype(np.uint32)
    raw_cap = max(256, n // 32)
    esc_dev = jnp.asarray(esc_np)
    raw_dev = jnp.asarray(raw_np)

    dtr0, r0 = timed(lambda: vrans._raw_compact(esc_dev, raw_dev, raw_cap))
    print(f"R0 scatter raw compaction:       {dtr0:8.1f} ms")
    dtr1, r1 = timed(lambda: raw_compact_sort(esc_dev, raw_dev, raw_cap))
    print(f"R1 sort raw compaction:          {dtr1:8.1f} ms")
    assert (np.asarray(r0) == np.asarray(r1)).all()
    print("R1 exactness: OK")


if __name__ == "__main__":
    main()
