"""Phase breakdown of mbt2018 compress/decompress (tpu format) on TPU."""
import time, json
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from compressai_environment_tpu.models import JointAutoregressiveHierarchicalPriors

h, w = 512, 768
ar = JointAutoregressiveHierarchicalPriors(192, 192).init(
    key=jax.random.key(1), input_shape=(1, h, w, 3)
)
ar.update(force=True)
ar.stream_format = "tpu"

rng = np.random.default_rng(0)
base = rng.random((1, h // 16, w // 16, 3), dtype=np.float32)
x = (np.clip(np.kron(base[0], np.ones((16, 16, 1), np.float32))[None], 0, 1) * 255).round().astype(np.uint8)

for _ in range(2):
    c = ar.compress(x)
    d = ar.decompress(c["strings"], c["shape"])
    jax.block_until_ready(d["x_hat"])

def t(f, reps=3):
    f()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); f(); ts.append(time.perf_counter() - t0)
    return round(min(ts), 4)

def out(k, v):
    print(json.dumps({k: v}), flush=True)

out("full_compress", t(lambda: ar.compress(x)))
out("full_decompress", t(lambda: jax.block_until_ready(ar.decompress(c["strings"], c["shape"])["x_hat"])))

# phases of compress
from compressai_environment_tpu.entropy_models import bottleneck as eb_ops
from compressai_environment_tpu.models.joint_ar import JointARNet
from compressai_environment_tpu.parallel.wavefront import (
    encode_ar_lanes, wavefront_encode_symbols, wavefront_decode,
)

xx = ar._nhwc(x)
enc = ar._jitted("encode", lambda p, v: ar.net.apply(p, v, method=JointARNet.encode))
out("g_a_h_a", t(lambda: jax.block_until_ready(enc({"params": ar.params}, ar._nhwc(x))[0])))
y, z = enc({"params": ar.params}, xx)
y, z = np.asarray(y), np.asarray(z)
out("z_code_roundtrip", t(lambda: eb_ops.decompress(
    eb_ops.compress(z, ar._medians(), ar.tables["z"], fmt="tpu"),
    z.shape[1:3], ar._medians(), ar.tables["z"], fmt="tpu")))
z_strings = eb_ops.compress(z, ar._medians(), ar.tables["z"], fmt="tpu")
z_hat = eb_ops.decompress(z_strings, z.shape[1:3], ar._medians(), ar.tables["z"], fmt="tpu")
hyper = ar._jitted("hyper_decode", lambda p, v: ar.net.apply(p, v, method=JointARNet.hyper_decode))
out("hyper_decode", t(lambda: jax.block_until_ready(hyper({"params": ar.params}, jnp.asarray(z_hat)))))
params_hs = np.asarray(hyper({"params": ar.params}, jnp.asarray(z_hat)))

w8 = ar._ar_weights_device()
tables = ar.tables["y"]

def wf():
    s, i, _ = wavefront_encode_symbols(y[0], params_hs[0], w8, ar.scale_table)
    jax.block_until_ready(s)
out("wavefront_encode_device", t(wf))
symbols, indexes, _ = wavefront_encode_symbols(y[0], params_hs[0], w8, ar.scale_table)
sym_np, idx_np = np.asarray(symbols), np.asarray(indexes)
out("download_symbols", t(lambda: np.asarray(wavefront_encode_symbols(y[0], params_hs[0], w8, ar.scale_table)[0])))
out("encode_ar_lanes", t(lambda: encode_ar_lanes(sym_np, idx_np, tables)))

blob = encode_ar_lanes(sym_np, idx_np, tables)
H, W = y.shape[1], y.shape[2]
out("wavefront_decode", t(lambda: jax.block_until_ready(
    wavefront_decode(blob, params_hs[0], w8, tables, ar.scale_table, H, W))))
