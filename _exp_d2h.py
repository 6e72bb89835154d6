import time, json
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

def t(f, reps=3):
    f()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); f(); ts.append(time.perf_counter() - t0)
    return round(min(ts), 4)

def out(k, v):
    print(json.dumps({k: v}), flush=True)

make = jax.jit(lambda a: a + 1)

for mb, dtype in [(4.8, np.uint16), (4.8, np.uint32), (28, np.uint8), (1, np.uint16)]:
    n = int(mb * 1e6 / np.dtype(dtype).itemsize)
    base = jnp.asarray(np.zeros(n, dtype))
    def dl(base=base):
        a = make(base)          # fresh computed array each rep
        return np.asarray(a)
    def dl_get(base=base):
        a = make(base)
        return jax.device_get(a)
    out(f"compute+np.asarray_{mb}MB_{np.dtype(dtype).name}", t(dl))
    out(f"compute+device_get_{mb}MB_{np.dtype(dtype).name}", t(dl_get))

# computed then sliced (encode's exact pattern)
base = jnp.asarray(np.zeros(4_500_000, np.uint16))
def enc_like():
    a = make(base)
    jax.block_until_ready(a)
    return np.asarray(a[:2408448])
def enc_like_get():
    a = make(base)
    jax.block_until_ready(a)
    return jax.device_get(a[:2408448])
jit_slice = jax.jit(lambda a: a[:2408448])
def enc_like_jit():
    a = make(base)
    jax.block_until_ready(a)
    return jax.device_get(jit_slice(a))
out("computed_slice_asarray", t(enc_like))
out("computed_slice_device_get", t(enc_like_get))
out("computed_jitslice_device_get", t(enc_like_jit))

# upload direction, computed use
h = np.zeros(14_000_000, np.uint16)
def ul():
    a = jnp.asarray(h)
    jax.block_until_ready(a)
out("h2d_28MB_u16", t(ul))
