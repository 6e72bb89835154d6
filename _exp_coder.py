"""Experiments: where does coder time go, and what makes it faster."""
import time, json, sys
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from compressai_environment_tpu.entropy import vrans

def out(k, v):
    print(json.dumps({k: v}), flush=True)

rng = np.random.default_rng(0)
NROWS = 192
stride = 64
cdfs = np.zeros((NROWS, stride), np.int32)
for i in range(NROWS):
    p = rng.random(stride - 2) + 0.01
    c = np.round(np.cumsum(p) / p.sum() * 65536).astype(np.int64)
    c[-1] = 65536
    cdfs[i, 1:stride - 1] = np.maximum.accumulate(np.minimum(c[: stride - 2], 65536))
    cdfs[i, stride - 1] = 65536
sizes = np.full(NROWS, stride, np.int32)
lut = vrans.build_decode_lut(cdfs, sizes)

def bench(f, reps=5):
    r = f(); jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = f(); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 4)

lut_dev = jnp.asarray(lut)
cdfs_dev = jnp.asarray(cdfs)

for lanes_total, T in ((24576, 288), (98304, 72), (196608, 36)):
    rows = jnp.asarray(rng.integers(0, NROWS, size=(T, lanes_total)).astype(np.int32))
    pad = jnp.zeros((T, lanes_total), bool)
    x0 = jnp.asarray(rng.integers(1 << 16, 1 << 31, size=lanes_total, dtype=np.int64).astype(np.uint32))
    words = jnp.asarray(rng.integers(0, 1 << 16, size=(T + 2, lanes_total), dtype=np.int64).astype(np.uint32))
    out(f"dec_scan_T{T}_L{lanes_total}",
        bench(lambda: vrans._decode_scan(x0, words, rows, pad, lut_dev, cdfs_dev, T)))
    starts = jnp.asarray(rng.integers(0, 1 << 15, size=(T, lanes_total), dtype=np.int64).astype(np.uint32))
    freqs = jnp.asarray(rng.integers(1 << 8, 1 << 14, size=(T, lanes_total), dtype=np.int64).astype(np.uint32))
    w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)
    out(f"enc_scan_T{T}_L{lanes_total}",
        bench(lambda: vrans._encode_scan_packed(starts, freqs, T, w_cap)))
    # raw encode scan without compaction
    out(f"enc_scan_raw_T{T}_L{lanes_total}",
        bench(lambda: vrans._encode_scan(starts, freqs, T)))
