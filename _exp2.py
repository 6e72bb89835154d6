"""Re-measure with forced host readback (axon async quirk)."""
import time, json
import numpy as np
import jax, jax.numpy as jnp

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
lut_dev, cdfs_dev = jnp.asarray(lut), jnp.asarray(cdfs)

def bench_rb(f, reps=5):
    """time including a tiny host readback to defeat async"""
    np.asarray(jax.tree_util.tree_leaves(f())[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        np.asarray(jax.tree_util.tree_leaves(r)[0])  # sync
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 4)

T, lanes_total = 288, 24576
rows = jnp.asarray(rng.integers(0, NROWS, size=(T, lanes_total)).astype(np.int32))
pad = jnp.zeros((T, lanes_total), bool)
x0 = jnp.asarray(rng.integers(1 << 16, 1 << 31, size=lanes_total, dtype=np.int64).astype(np.uint32))
words = jnp.asarray(rng.integers(0, 1 << 16, size=(T + 2, lanes_total), dtype=np.int64).astype(np.uint32))

out("dec_scan_readback_T288", bench_rb(lambda: vrans._decode_scan(x0, words, rows, pad, lut_dev, cdfs_dev, T)))

starts = jnp.asarray(rng.integers(0, 1 << 15, size=(T, lanes_total), dtype=np.int64).astype(np.uint32))
freqs = jnp.asarray(rng.integers(1 << 8, 1 << 14, size=(T, lanes_total), dtype=np.int64).astype(np.uint32))
w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)
out("enc_scan_packed_readback_T288", bench_rb(lambda: vrans._encode_scan_packed(starts, freqs, T, w_cap)))

# block_until_ready version for comparison
def bench_b(f, reps=5):
    jax.block_until_ready(f())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(f()); ts.append(time.perf_counter() - t0)
    return round(min(ts), 4)
out("dec_scan_block_T288", bench_b(lambda: vrans._decode_scan(x0, words, rows, pad, lut_dev, cdfs_dev, T)))

# now the full decode_batch_device path with pre-built blobs, isolating host vs device
from compressai_environment_tpu.entropy_models.base import CdfTables
tables = CdfTables(cdfs, sizes, np.zeros(NROWS, np.int32))
B, n = 24, 294912
sym = rng.integers(0, 40, size=(B, n)).astype(np.int32)
idx = rng.integers(0, NROWS, size=(B, n)).astype(np.int32)
sym_dev, idx_dev = jnp.asarray(sym), jnp.asarray(idx)
np.asarray(sym_dev); np.asarray(idx_dev)

t0 = time.perf_counter()
blobs = vrans.encode_batch_device(sym_dev, idx_dev, tables)
out("encode_batch_device_cold", round(time.perf_counter() - t0, 3))
t0 = time.perf_counter()
blobs = vrans.encode_batch_device(sym_dev, idx_dev, tables)
out("encode_batch_device_warm", round(time.perf_counter() - t0, 3))

t0 = time.perf_counter()
dec = vrans.decode_batch_device(blobs, idx_dev, tables)
np.asarray(dec)
out("decode_batch_device_cold", round(time.perf_counter() - t0, 3))
t0 = time.perf_counter()
dec = vrans.decode_batch_device(blobs, idx_dev, tables)
np.asarray(dec)
out("decode_batch_device_warm", round(time.perf_counter() - t0, 3))

# host-unpack cost alone (numpy portion of decode_batch_device)
t0 = time.perf_counter()
unpacked = [vrans._unpack_blob(b, n) for b in blobs]
counts_all = np.concatenate([u[1] for u in unpacked])
body = counts_all - 2
stream_all = np.concatenate([u[2] for u in unpacked])
bounds = np.concatenate([[0], np.cumsum(counts_all)])[:-1]
x0h = (stream_all[bounds].astype(np.uint32) | (stream_all[bounds + 1].astype(np.uint32) << 16))
total_body = int(body.sum())
lane_of = np.repeat(np.arange(len(counts_all)), body)
j_of = np.arange(total_body) - np.repeat(np.cumsum(body) - body, body)
src = np.repeat(bounds + 2, body) + j_of
max_w = 1 << (max(1, int(body.max())) - 1).bit_length()
wordsh = np.zeros((max_w, len(counts_all)), np.uint16)
wordsh[j_of, lane_of] = stream_all[src]
out("decode_host_unpack", round(time.perf_counter() - t0, 3))

ok = np.array_equal(np.asarray(dec), sym)
out("roundtrip_ok", bool(ok))
