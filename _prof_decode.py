import time, json
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from compressai_environment_tpu.models import FactorizedPrior
from compressai_environment_tpu.entropy_models import bottleneck as eb_ops
from compressai_environment_tpu.entropy import vrans

n, h, w = 24, 512, 768
model = FactorizedPrior(128, 192).init(key=jax.random.key(0), input_shape=(1, h, w, 3))
model.update(force=True)
model.stream_format = "tpu"

rng = np.random.default_rng(0)
base = rng.random((n, h // 16, w // 16, 3), dtype=np.float32)
x = (np.clip(np.stack([np.kron(b, np.ones((16, 16, 1), np.float32)) for b in base]), 0, 1) * 255).round().astype(np.uint8)

c = model.compress(x)
out = model.decompress(c["strings"], c["shape"])
jax.block_until_ready(out["x_hat"])

# --- phase timing for decompress ---
strings, shape = c["strings"][0], c["shape"]
tables = model.tables["y"]
medians = model._medians()

import compressai_environment_tpu.entropy_models.bottleneck as B
import inspect
src = inspect.getsource(B.decompress)
print(src)

def t(f, reps=3):
    f()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); f(); ts.append(time.perf_counter() - t0)
    return min(ts)

# full decompress
d_full = t(lambda: jax.block_until_ready(model.decompress(c["strings"], shape)["x_hat"]))
# eb decompress only (symbols -> y_hat host/device?)
d_eb = t(lambda: jax.block_until_ready(jnp.asarray(eb_ops.decompress(strings, tuple(shape), medians, tables, fmt="tpu"))))
# g_s only
y_hat = eb_ops.decompress(strings, tuple(shape), medians, tables, fmt="tpu")
y_dev = jnp.asarray(y_hat); jax.block_until_ready(y_dev)
from compressai_environment_tpu.models.google import FactorizedPriorNet
decode = model._jitted("decode", lambda p, v: model.net.apply(p, v, method=FactorizedPriorNet.decode))
d_gs = t(lambda: jax.block_until_ready(decode({"params": model.params}, y_dev)))

# vrans decode_batch_device only
idx = np.broadcast_to(np.arange(192, dtype=np.int32)[None, None, None, :], (n, shape[0], shape[1], 192)).reshape(n, -1)
idx_dev = jnp.asarray(idx)
d_vr = t(lambda: jax.block_until_ready(vrans.decode_batch_device(strings, idx_dev, tables)))

# encode phases
enc_full = t(lambda: model.compress(x))
enc_ga = None
print(json.dumps({"decomp_full": d_full, "eb_decomp": d_eb, "g_s": d_gs, "vrans_dec": d_vr, "enc_full": enc_full}))
