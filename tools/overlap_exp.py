"""Does the axon dev tunnel overlap H2D transfers with device compute?

bench.py round-3 phase sums match its encode wall exactly (zero overlap),
suggesting transfers and compute serialize at the RPC layer. If so, encode
chunking (which exists to overlap chunk i+1's compute with chunk i's D2H)
is pure dispatch overhead and one big dispatch should win. Measures:

  O1  device_put(28 MB) alone; g_a(24 imgs, resident) alone; then
      device_put + g_a dispatched together — overlap = sum - together.
  O2  encode roundtrip chunk sweep: CHUNK in {24, 12, 6} with the P2/P4
      bench structure (per-chunk upload+compress_async, one batched decode).

Run on the TPU: `timeout 1500 python tools/overlap_exp.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from pipeline_exp import content, load_model  # noqa: E402  (same dir)


def best(f, n=3):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    n, h, w = 24, 512, 768
    model = load_model()
    x = content(n, h, w)
    mb = x.nbytes / 1e6

    net, cls = model.net, type(model.net)
    cdt = model._compute_dtype
    enc = jax.jit(
        lambda p, v: net.apply(
            p, v.astype(cdt) / np.asarray(255.0, cdt), method=cls.encode
        )
    )
    x_res = jax.block_until_ready(jnp.asarray(x))  # resident copy for O1

    t_put = best(lambda: jax.block_until_ready(jax.device_put(x)))
    t_ga = best(
        lambda: jax.block_until_ready(enc({"params": model.params}, x_res))
    )

    def together():
        a = jax.device_put(x)
        b = enc({"params": model.params}, x_res)
        jax.block_until_ready(a)
        jax.block_until_ready(b)

    t_both = best(together)
    print(
        f"O1 upload {t_put:.0f} ms  g_a {t_ga:.0f} ms  together {t_both:.0f} ms"
        f"  overlap {(t_put + t_ga - t_both):.0f} ms"
    )

    def roundtrip(chunk):
        handles = [
            model.compress_async(jax.device_put(x[i : i + chunk]))
            for i in range(0, n, chunk)
        ]
        outs = [hd.result() for hd in handles]
        strings = [s for o in outs for s in o["strings"][0]]
        dec = model.decompress([strings], outs[0]["shape"])
        jax.block_until_ready(dec["x_hat"])

    for chunk in (24, 12, 6):
        t = best(lambda: roundtrip(chunk))
        print(f"O2 roundtrip chunk={chunk:2d}: {t:7.1f} ms  {mb/(t/1e3):6.1f} MB/s")


if __name__ == "__main__":
    main()
