"""Validate: per-gather-pass cost, and the sf-packed 2-gather decode scan."""
import time, json
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from compressai_environment_tpu.entropy import vrans

def out(k, v):
    print(json.dumps({k: v}), flush=True)

rng = np.random.default_rng(0)
NROWS, stride = 192, 64
cdfs = np.zeros((NROWS, stride), np.int32)
for i in range(NROWS):
    c = np.round(np.cumsum(rng.random(stride - 2) + 0.01) * 65536).astype(np.int64)
    c = (c / c[-1] * 65536).astype(np.int64)
    cdfs[i, 1:stride - 1] = np.maximum.accumulate(np.minimum(c[: stride - 2], 65536))
    cdfs[i, stride - 1] = 65536
sizes = np.full(NROWS, stride, np.int32)
lut = vrans.build_decode_lut(cdfs, sizes)

def sync(r):
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])

def bench(f, reps=5):
    sync(f())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); sync(f()); ts.append(time.perf_counter() - t0)
    return round(min(ts), 4)

# one big gather of 7M from 50MB table
N = 7077888
rows_big = jnp.asarray(rng.integers(0, NROWS, size=N).astype(np.int32))
cums_big = jnp.asarray(rng.integers(0, 65536, size=N).astype(np.int32))
lut_dev = jnp.asarray(lut)

@jax.jit
def big_gather(rows, cums, lut):
    return lut[rows, cums]
out("one_big_gather_7M", bench(lambda: big_gather(rows_big, cums_big, lut_dev)))

lut16_dev = jnp.asarray(lut.astype(np.int16))
@jax.jit
def big_gather16(rows, cums, lut):
    return lut[rows, cums].astype(jnp.int32)
out("one_big_gather16_7M", bench(lambda: big_gather16(rows_big, cums_big, lut16_dev)))

# sf-packed scan: ONE in-scan table gather + words gather; outputs cum
sf = np.zeros((NROWS, 1 << 16), np.uint32)
for i in range(NROWS):
    s = lut[i]
    start = cdfs[i][s].astype(np.uint32)
    freq = (cdfs[i][s + 1] - cdfs[i][s]).astype(np.uint32)
    sf[i] = start | ((freq - 1) << 16)
sf_dev = jnp.asarray(sf)

@partial(jax.jit, static_argnames=("T",))
def decode_scan_sf(x0, words, rows, pad_mask, sf, T):
    lanes = rows.shape[1]
    lane_iota = jnp.arange(lanes)
    MASK16 = np.uint32(0xFFFF); L = np.uint32(1 << 16)
    def step(carry, inp):
        x, cursor = carry
        row, padm = inp
        cum = (x & MASK16).astype(jnp.uint32)
        safe_row = jnp.maximum(row, 0)
        v = sf[safe_row, cum.astype(jnp.int32)]
        start = v & MASK16
        freq = (v >> np.uint32(16)) + np.uint32(1)
        start = jnp.where(padm, jnp.uint32(0), start)
        freq = jnp.where(padm, L, freq)
        x = freq * (x >> np.uint32(16)) + cum - start
        need = x < L
        w = words[jnp.minimum(cursor, words.shape[0] - 1), lane_iota]
        x = jnp.where(need, (x << np.uint32(16)) | w, x)
        cursor = cursor + need.astype(jnp.int32)
        return (x, cursor), cum
    (x, c), cums = jax.lax.scan(step, (x0, jnp.zeros((lanes,), jnp.int32)), (rows, pad_mask))
    return cums

T, lanes_total = 288, 24576
rows = rng.integers(0, NROWS, size=(T, lanes_total)).astype(np.int32)
pad = np.zeros((T, lanes_total), bool)
x0v = rng.integers(1 << 16, 1 << 31, size=lanes_total, dtype=np.int64).astype(np.uint32)
words = rng.integers(0, 1 << 16, size=(T + 2, lanes_total), dtype=np.int64).astype(np.uint32)
a = (jnp.asarray(x0v), jnp.asarray(words), jnp.asarray(rows), jnp.asarray(pad))

out("dec_scan_sf_T288", bench(lambda: decode_scan_sf(*a, sf_dev, T=T)))

# full pipeline: sf scan + post-pass symbol gather
@partial(jax.jit, static_argnames=("T",))
def decode_sf_full(x0, words, rows, pad_mask, sf, lut, T):
    cums = decode_scan_sf(x0, words, rows, pad_mask, sf, T)
    safe = jnp.maximum(rows, 0)
    return lut[safe, cums.astype(jnp.int32)]
out("dec_sf_plus_post_T288", bench(lambda: decode_sf_full(*a, sf_dev, lut16_dev, T=T)))

# correctness vs reference scan
ref = vrans._decode_scan(*a, lut_dev, jnp.asarray(cdfs), T)
got = decode_sf_full(*a, sf_dev, lut16_dev, T=T)
out("sf_matches_ref", bool(np.array_equal(np.asarray(ref), np.asarray(got).astype(np.int32))))
