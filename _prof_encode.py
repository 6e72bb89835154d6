"""Phase breakdown of model.compress on the TPU (tpu stream format)."""
import time, json
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from compressai_environment_tpu.models import FactorizedPrior
from compressai_environment_tpu.entropy import vrans
from compressai_environment_tpu.entropy.vrans import (
    _encode_device_core2, _lane_layout, DEFAULT_LANES,
)

n, h, w = 24, 512, 768
model = FactorizedPrior(128, 192).init(key=jax.random.key(0), input_shape=(1, h, w, 3))
model.update(force=True)
model.stream_format = "tpu"

rng = np.random.default_rng(0)
base = rng.random((n, h // 16, w // 16, 3), dtype=np.float32)
x = (np.clip(np.stack([np.kron(b, np.ones((16, 16, 1), np.float32)) for b in base]), 0, 1) * 255).round().astype(np.uint8)

c = model.compress(x)
jax.block_until_ready(jnp.zeros(1))

def t(f, reps=3):
    f()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); f(); ts.append(time.perf_counter() - t0)
    return round(min(ts), 4)

def out(k, v):
    print(json.dumps({k: v}), flush=True)

out("full_compress", t(lambda: model.compress(x)))

# phase 1: upload
x_dev = jnp.asarray(x); jax.block_until_ready(x_dev)
out("upload_x_28MB", t(lambda: jax.block_until_ready(jnp.asarray(x))))

# phase 2: analysis transform (whatever model.compress does before entropy coding)
# find the jitted encode fn
from compressai_environment_tpu.models.google import FactorizedPriorNet
enc = model._jitted("encode", lambda p, v: model.net.apply(p, v, method=FactorizedPriorNet.encode))
import inspect
y = enc(model.params, model._ingest(x)) if hasattr(model, "_ingest") else None
print("has_ingest", hasattr(model, "_ingest"))

# fallback: time compress minus coder by monkeypatching encode_batch_device
orig = vrans.encode_batch_device
vrans.encode_batch_device = lambda s, i, tb, lanes=DEFAULT_LANES: (jax.block_until_ready(s), [b""])[1]
out("compress_sans_coder", t(lambda: model.compress(x)))
vrans.encode_batch_device = orig

# phase 3: coder alone at the real shapes
import compressai_environment_tpu.entropy_models.bottleneck as eb
tables = model.tables["y"]
medians = model._medians()
# reproduce symbols/indexes on device
xx = jnp.asarray(x)
# run model pipeline up to symbols by calling compress but capturing inputs
cap = {}
def capture(s, i, tb, lanes=DEFAULT_LANES):
    cap["s"] = s; cap["i"] = i
    return orig(s, i, tb, lanes)
vrans.encode_batch_device = capture
model.compress(x)
vrans.encode_batch_device = orig
s_dev, i_dev = cap["s"], cap["i"]
jax.block_until_ready(s_dev)

out("coder_only", t(lambda: orig(s_dev, i_dev, tables)))

# sub-phases of coder
B, nn = s_dev.shape
T = _lane_layout(nn, DEFAULT_LANES)
w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)
raw_cap = max(256, nn // 32)
pt = tables.device_packed

def core_only():
    r = _encode_device_core2(s_dev, i_dev, pt["cdf2"], pt["mo"], T, DEFAULT_LANES, w_cap, raw_cap)
    jax.block_until_ready(r[1])
out("core2_device_only", t(core_only))

r = _encode_device_core2(s_dev, i_dev, pt["cdf2"], pt["mo"], T, DEFAULT_LANES, w_cap, raw_cap)
flat_dev, counts, overflow, raw, raw_counts, raw_ovf = r
jax.block_until_ready(counts)
counts_np = np.asarray(counts).astype(np.int64)
total = int(counts_np.sum())
out("flat_words_total", total)
out("download_flat", t(lambda: np.asarray(flat_dev[:total])))
out("download_counts", t(lambda: np.asarray(counts)))
out("download_raw_counts", t(lambda: np.asarray(raw_counts)))
out("overflow_check", t(lambda: bool(overflow)))
