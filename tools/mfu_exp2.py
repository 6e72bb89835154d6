"""Round-5 MFU hunt part 2: time the REAL g_a/g_s stacks and their layers.

Timing method (axon tunnel): each candidate is wrapped so the jit returns a
TINY slice of its result (execution still covers the full op; output buffer
freed after the slice). N dispatches are enqueued back-to-back, then the
LAST output is fetched with np.asarray — a real host round trip; in-order
device execution means all N completed. Per-dispatch time = wall / N.
``jax.block_until_ready`` alone does NOT sync over this tunnel.
"""
from __future__ import annotations

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

PEAK = 197e12
N = 16
B = 24


def tiny(f):
    """Wrap f so the jitted computation returns only 8 output scalars."""
    return jax.jit(lambda *a: f(*a).ravel()[:8])


def timeit(f, *a):
    y = f(*a)
    np.asarray(y)  # compile + real sync
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        ys = [f(*a) for _ in range(N)]
        np.asarray(ys[-1])  # in-order execution: last done => all done
        best = min(best, (time.perf_counter() - t0) / N)
    return best


def rep(name, t, flops=0.0):
    s = f"{name:52s} {t*1e3:8.2f} ms"
    if flops:
        tf = flops / t / 1e12
        s += f"  {tf:7.2f} TF/s ({100*tf*1e12/PEAK:5.1f}%)"
    print(s, flush=True)


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

    enc = tiny(lambda p, v: net.apply(p, v, method=cls.encode))
    rep("g_a full (repo, bf16)", timeit(enc, params, x), 791.7e9)

    y = jax.jit(lambda p, v: net.apply(p, v, method=cls.encode))(params, x)
    np.asarray(y.ravel()[:1])
    dec = tiny(lambda p, v: net.apply(p, v, method=cls.decode))
    rep("g_s full (repo, bf16)", timeit(dec, params, y), 791.6e9)

    # GDN matmul in isolation: (B,384,256,128) x (128,128)
    g = jnp.asarray(rng.random((128, 128)) * 0.1, jnp.float32)
    xx = jnp.asarray(rng.standard_normal((B, 384, 256, 128)), jnp.bfloat16)
    fl = 2 * B * 384 * 256 * 128 * 128

    for nm, gg, pr, pet in [
        ("gdn-mm f32gamma HIGHEST pet=f32 (repo)", g, lax.Precision.HIGHEST, jnp.float32),
        ("gdn-mm f32gamma DEFAULT pet=f32", g, lax.Precision.DEFAULT, jnp.float32),
        ("gdn-mm bf16gamma DEFAULT pet=f32", g.astype(jnp.bfloat16), lax.Precision.DEFAULT, jnp.float32),
    ]:
        f = tiny(lambda v, gg=gg, pr=pr, pet=pet: v * lax.rsqrt(
            jnp.matmul(jnp.square(v), gg.T, precision=pr,
                       preferred_element_type=pet) + 0.1))
        rep(nm, timeit(f, xx), fl)

    from compressai_environment_tpu.layers import GDN
    gdn = GDN()
    gp = gdn.init(jax.random.key(0), xx)
    gp16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                        if a.dtype == jnp.float32 else a, gp)
    f = tiny(lambda p, v: gdn.apply(p, v))
    rep("GDN module f32-params", timeit(f, gp, xx), fl)
    rep("GDN module bf16-params", timeit(f, gp16, xx), fl)

    # conv variants
    k5 = jnp.asarray(rng.standard_normal((5, 5, 128, 128)) * 0.05, jnp.bfloat16)
    xc = jnp.asarray(rng.standard_normal((B, 384, 256, 128)), jnp.bfloat16)
    flc = 2 * B * 192 * 128 * 25 * 128 * 128
    for nm, pr in [("HIGHEST", lax.Precision.HIGHEST),
                   ("DEFAULT", lax.Precision.DEFAULT)]:
        f = tiny(lambda v, pr=pr: lax.conv_general_dilated(
            v, k5, (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=pr))
        rep(f"conv 128->128 5x5 s2 @384x256 {nm}", timeit(f, xc), flc)

    k0 = jnp.asarray(rng.standard_normal((5, 5, 3, 128)) * 0.1, jnp.bfloat16)
    x0 = jnp.asarray(rng.random((B, 512, 768, 3)), jnp.bfloat16)
    f = tiny(lambda v: lax.conv_general_dilated(
        v, k0, (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST))
    rep("conv0 3->128 5x5 s2 @512x768", timeit(f, x0),
        2 * B * 256 * 384 * 25 * 3 * 128)

    kd = jnp.asarray(rng.standard_normal((5, 5, 128, 3)) * 0.1, jnp.bfloat16)
    xd = jnp.asarray(rng.standard_normal((B, 256, 384, 128)), jnp.bfloat16)
    f = tiny(lambda v: lax.conv_general_dilated(
        v, kd, (1, 1), [(2, 3), (2, 3)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST))
    rep("deconv 128->3 5x5 up2 @256x384", timeit(f, xd),
        2 * B * 512 * 768 * 25 * 128 * 3 / 4)

    kdm = jnp.asarray(rng.standard_normal((5, 5, 128, 128)) * 0.05, jnp.bfloat16)
    xdm = jnp.asarray(rng.standard_normal((B, 96, 192, 128)), jnp.bfloat16)
    for nm, pr in [("HIGHEST", lax.Precision.HIGHEST),
                   ("DEFAULT", lax.Precision.DEFAULT)]:
        f = tiny(lambda v, pr=pr: lax.conv_general_dilated(
            v, kdm, (1, 1), [(2, 3), (2, 3)], lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=pr))
        rep(f"deconv 128->128 5x5 up2 @96x192 {nm}", timeit(f, xdm),
            2 * B * 192 * 384 * 25 * 128 * 128 / 4)


if __name__ == "__main__":
    main()
