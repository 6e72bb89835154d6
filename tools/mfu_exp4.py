"""Round-5 MFU hunt part 4: repo flax g_a vs functional replica, head-to-head.

Same input, same timing method (sum outputs, pipelined dispatches, forced
fetch). Also dumps compiled-HLO op histograms for both to spot the
difference.
"""
from __future__ import annotations

import collections
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 16
B = 24
DN = ("NHWC", "HWIO", "NHWC")


def timeit(f, *a):
    y = f(*a)
    np.asarray(y)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        ys = [f(*a) for _ in range(N)]
        np.asarray(ys[-1])
        best = min(best, (time.perf_counter() - t0) / N)
    return best


def histo(jf, *a):
    txt = jf.lower(*a).compile().as_text()
    ops = collections.Counter()
    for line in txt.splitlines():
        m = re.search(r"=\s+\S+\s+(\w+)\(", line)
        if m:
            ops[m.group(1)] += 1
    return ops, txt


def main():
    from compressai_environment_tpu.models import FactorizedPrior
    from compressai_environment_tpu.utils.checkpoint import restore_into

    print(f"devices: {jax.devices()}", flush=True)
    model = FactorizedPrior(128, 192)
    restore_into(model, "checkpoints/bmshj2018-factorized-synth-q5.msgpack")
    model.half()
    net, cls = model.net, type(model.net)
    params = {"params": model.params}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 512, 768, 3)), jnp.bfloat16)

    mod = jax.jit(lambda p, v: jnp.sum(
        net.apply(p, v, method=cls.encode).astype(jnp.float32)))
    t = timeit(mod, params, x)
    print(f"repo module g_a: {t*1e3:.2f} ms", flush=True)

    p_ga = model.params["g_a"]

    from compressai_environment_tpu.ops.parametrizers import (
        NonNegativeParametrizer,
    )

    def conv_l(v, prm, stride):
        k = prm["kernel"].astype(jnp.bfloat16)
        pad = k.shape[0] // 2
        y = lax.conv_general_dilated(
            v.astype(jnp.bfloat16), k, (stride, stride),
            [(pad, pad), (pad, pad)], dimension_numbers=DN,
            precision=lax.Precision.HIGHEST)
        return y + prm["bias"].astype(jnp.bfloat16)

    def gdn_l(v, prm):
        br = NonNegativeParametrizer(minimum=1e-6)
        gr = NonNegativeParametrizer()
        beta = br(prm["beta"])
        gamma = gr(prm["gamma"])
        norm = jnp.matmul(jnp.square(v), gamma.T,
                          precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32) + beta
        return v * lax.rsqrt(norm)

    def stack(p, v):
        v = conv_l(v, p["0"], 2)
        v = gdn_l(v, p["1"])
        v = conv_l(v, p["2"], 2)
        v = gdn_l(v, p["3"])
        v = conv_l(v, p["4"], 2)
        v = gdn_l(v, p["5"])
        return conv_l(v, p["6"], 2)

    fn = jax.jit(lambda p, v: jnp.sum(stack(p, v).astype(jnp.float32)))
    t = timeit(fn, p_ga, x)
    print(f"functional g_a:  {t*1e3:.2f} ms", flush=True)

    hm, tm = histo(mod, params, x)
    hf, tf = histo(fn, p_ga, x)
    keys = sorted(set(hm) | set(hf))
    print(f"\n{'op':28s} {'module':>8s} {'functional':>10s}")
    for k in keys:
        if hm.get(k, 0) != hf.get(k, 0):
            print(f"{k:28s} {hm.get(k,0):8d} {hf.get(k,0):10d}")
    Path("/tmp/hlo_module.txt").write_text(tm)
    Path("/tmp/hlo_functional.txt").write_text(tf)
    print("\nHLO dumps: /tmp/hlo_module.txt /tmp/hlo_functional.txt")

    # numeric agreement
    a = jax.jit(lambda p, v: net.apply(p, v, method=cls.encode))(params, x)
    b = jax.jit(stack)(p_ga, x)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max abs diff module vs functional: {err:.3e}")


if __name__ == "__main__":
    main()
