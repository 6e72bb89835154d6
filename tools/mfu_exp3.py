"""Round-5 MFU hunt part 3: prefix-stack timing of g_a/g_s with sum outputs.

Each candidate jit returns jnp.sum(result) so XLA cannot dead-code-eliminate
or slice-narrow the computation. N pipelined dispatches, one forced host
fetch at the end (np.asarray on the last scalar) — per-dispatch = chip time.
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
DN = ("NHWC", "HWIO", "NHWC")


def summed(f):
    return jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))


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


def rep(name, t, flops=0.0):
    s = f"{name:56s} {t*1e3:8.2f} ms"
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

    # --- g_a prefix stacks through the real flax module ---
    ga = net.g_a if hasattr(net, "g_a") else None
    print("attrs:", [a for a in dir(net) if not a.startswith("_")][:20],
          flush=True)

    # fall back: rebuild the stack functionally from params
    p_ga = model.params["g_a"]

    def conv_l(v, prm, stride):
        k = prm["kernel"].astype(jnp.bfloat16)
        pad = k.shape[0] // 2
        y = lax.conv_general_dilated(
            v.astype(jnp.bfloat16), k, (stride, stride),
            [(pad, pad), (pad, pad)], dimension_numbers=DN,
            precision=lax.Precision.HIGHEST)
        return y + prm["bias"].astype(jnp.bfloat16)

    def gdn_l(v, prm, inverse=False):
        # reproduce layers/gdn.py incl. reparam
        from compressai_environment_tpu.ops.parametrizers import (
            NonNegativeParametrizer,
        )
        br = NonNegativeParametrizer(minimum=1e-6)
        gr = NonNegativeParametrizer()
        beta = br(prm["beta"])
        gamma = gr(prm["gamma"])
        norm = jnp.matmul(jnp.square(v), gamma.T,
                          precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32) + beta
        norm = jnp.sqrt(norm) if inverse else lax.rsqrt(norm)
        return v * norm

    stages = [
        ("conv0", lambda v: conv_l(v, p_ga["0"], 2)),
        ("gdn1", lambda v: gdn_l(v, p_ga["1"])),
        ("conv2", lambda v: conv_l(v, p_ga["2"], 2)),
        ("gdn3", lambda v: gdn_l(v, p_ga["3"])),
        ("conv4", lambda v: conv_l(v, p_ga["4"], 2)),
        ("gdn5", lambda v: gdn_l(v, p_ga["5"])),
        ("conv6", lambda v: conv_l(v, p_ga["6"], 2)),
    ]

    prev = 0.0
    for i in range(1, len(stages) + 1):
        def stack(v, i=i):
            for _, f in stages[:i]:
                v = f(v)
            return v
        t = timeit(summed(stack), x)
        rep(f"g_a prefix..{stages[i-1][0]} (delta {1e3*(t-prev):+.2f} ms)", t)
        prev = t

    # --- g_s prefix stacks ---
    y = jax.jit(lambda p, v: net.apply(p, v, method=cls.encode))(params, x)
    np.asarray(jnp.sum(y.astype(jnp.float32)))
    p_gs = model.params["g_s"]

    def deconv_l(v, prm, stride=2):
        k = prm["kernel_t"].astype(jnp.bfloat16)
        kk = k.shape[0]
        pad = kk // 2
        lo = kk - 1 - pad
        hi = kk - 1 - pad + stride - 1
        yv = lax.conv_general_dilated(
            v.astype(jnp.bfloat16), k, (1, 1), [(lo, hi), (lo, hi)],
            lhs_dilation=(stride, stride), dimension_numbers=DN,
            precision=lax.Precision.HIGHEST)
        return yv + prm["bias"].astype(jnp.bfloat16)

    dstages = [
        ("deconv0", lambda v: deconv_l(v, p_gs["0"])),
        ("igdn1", lambda v: gdn_l(v, p_gs["1"], True)),
        ("deconv2", lambda v: deconv_l(v, p_gs["2"])),
        ("igdn3", lambda v: gdn_l(v, p_gs["3"], True)),
        ("deconv4", lambda v: deconv_l(v, p_gs["4"])),
        ("igdn5", lambda v: gdn_l(v, p_gs["5"], True)),
        ("deconv6", lambda v: deconv_l(v, p_gs["6"])),
    ]
    prev = 0.0
    for i in range(1, len(dstages) + 1):
        def stack(v, i=i):
            for _, f in dstages[:i]:
                v = f(v)
            return v
        t = timeit(summed(stack), y)
        rep(f"g_s prefix..{dstages[i-1][0]} (delta {1e3*(t-prev):+.2f} ms)", t)
        prev = t

    # --- candidate fix for the last deconv: phase-conv + depth-to-space ---
    kt = np.asarray(p_gs["6"]["kernel_t"], np.float32)  # (5,5,128,3) flipped
    C_in, C_out = kt.shape[2], kt.shape[3]
    # deconv output pixel (2i+di, 2j+dj) = sum over taps where the dilated
    # conv with pad (2,3) hits non-stuffed inputs. Derive phase kernels
    # directly: out[oy,ox] = sum_{a,b} k[a,b] * xin[(oy+a-2)/2, (ox+b-2)/2]
    # for (oy+a-2)%2==0. For phase dy=oy%2: taps a with (a-2+dy)%2==0.
    kphase = np.zeros((2, 2, 3, 3, C_in, C_out), np.float32)
    for dy in range(2):
        for dx in range(2):
            for a in range(5):
                if (a - 2 + dy) % 2:
                    continue
                ia = (a - 2 + dy) // 2  # input row offset in {-1,0,1}
                for bb in range(5):
                    if (bb - 2 + dx) % 2:
                        continue
                    ib = (bb - 2 + dx) // 2
                    kphase[dy, dx, ia + 1, ib + 1] = kt[a, bb]
    # fold into one conv: out channels = (dy,dx,cout) -> 12, then d2s
    kfold = kphase.transpose(2, 3, 4, 0, 1, 5).reshape(3, 3, C_in, 4 * C_out)
    kfold16 = jnp.asarray(kfold, jnp.bfloat16)
    bias16 = jnp.tile(p_gs["6"]["bias"].astype(jnp.bfloat16), 4)

    def subpel_last(v):
        yv = lax.conv_general_dilated(
            v.astype(jnp.bfloat16), kfold16, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=DN, precision=lax.Precision.HIGHEST) + bias16
        b, h, w, _ = yv.shape
        yv = yv.reshape(b, h, w, 2, 2, C_out)
        yv = yv.transpose(0, 1, 3, 2, 4, 5)
        return yv.reshape(b, h * 2, w * 2, C_out)

    xin = jnp.asarray(rng.standard_normal((B, 256, 384, C_in)), jnp.bfloat16)
    t = timeit(summed(subpel_last), xin)
    rep("last-deconv as phase-conv+d2s", t, 2 * B * 512 * 768 * 25 * 128 * 3 / 4)
    t = timeit(summed(lambda v: deconv_l(v, p_gs["6"])), xin)
    rep("last-deconv direct (repo)", t, 2 * B * 512 * 768 * 25 * 128 * 3 / 4)
    # numeric parity
    a1 = jax.jit(lambda v: deconv_l(v.astype(jnp.float32), jax.tree.map(
        lambda q: q.astype(jnp.float32), p_gs["6"])))(xin.astype(jnp.float32))
    # f32 variant of subpel
    kfold32 = jnp.asarray(kfold)
    bias32 = jnp.tile(np.asarray(p_gs["6"]["bias"], np.float32), 4)

    def subpel32(v):
        yv = lax.conv_general_dilated(
            v, kfold32, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=DN, precision=lax.Precision.HIGHEST) + bias32
        b, h, w, _ = yv.shape
        yv = yv.reshape(b, h, w, 2, 2, C_out).transpose(0, 1, 3, 2, 4, 5)
        return yv.reshape(b, h * 2, w * 2, C_out)

    a2 = jax.jit(subpel32)(xin.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(a1.astype(jnp.float32) - a2)))
    print(f"phase-conv vs deconv max abs err (f32): {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
