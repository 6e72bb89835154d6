"""Isolated TPU timing of the g_a/g_s conv pipeline variants (round-5 MFU hunt).

Timing method for the RPC-tunnel: enqueue N independent dispatches of the
same jitted conv back-to-back (the tunnel pipelines them), block once; the
per-dispatch cost converges to chip wall-clock for N >> 1.

Usage: python tools/mfu_exp.py [--n 16] [--batch 24] [--quick]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

PEAK_BF16 = 197e12  # v5e bf16 peak FLOP/s


def conv_fn(k, stride, prec, lhs_dil=None):
    p = k.shape[0] // 2
    def f(x):
        return lax.conv_general_dilated(
            x, k, (stride, stride), [(p, p), (p, p)],
            lhs_dilation=lhs_dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    return jax.jit(f)


def time_dispatches(f, x, n):
    y = f(x)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [f(x) for _ in range(n)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def report(name, per_s, flops):
    tf = flops / per_s / 1e12
    print(f"{name:54s} {per_s*1e3:8.2f} ms  {tf:7.2f} TF/s "
          f"({100*tf*1e12/PEAK_BF16:5.1f}% peak)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    B, N = args.batch, args.n
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    H, W, C = 384, 256, 128
    flops = 2 * B * (H // 2) * (W // 2) * 5 * 5 * C * C
    xs32 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    ks32 = jnp.asarray(rng.standard_normal((5, 5, C, C)) * 0.05, jnp.float32)
    xs16, ks16 = xs32.astype(jnp.bfloat16), ks32.astype(jnp.bfloat16)

    print(f"\n== dominant g_a conv 128->128 5x5 s2 @ {B}x{H}x{W} "
          f"({flops/1e9:.1f} GFLOP) ==", flush=True)
    cases = [
        ("bf16 DEFAULT", xs16, ks16, lax.Precision.DEFAULT),
        ("bf16 HIGHEST (status quo)", xs16, ks16, lax.Precision.HIGHEST),
    ]
    if not args.quick:
        cases += [
            ("f32  DEFAULT", xs32, ks32, lax.Precision.DEFAULT),
            ("f32  HIGHEST", xs32, ks32, lax.Precision.HIGHEST),
        ]
    for nm, xx, kk, pr in cases:
        report(nm, time_dispatches(conv_fn(kk, 2, pr), xx, N), flops)

    # space-to-depth folded variant
    def s2d(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

    k5n = np.asarray(ks32)
    kf = np.zeros((3, 3, 4, C, C), np.float32)
    for a in range(5):
        fa, pa = (a - 2) // 2 + 1, (a - 2) % 2
        for b in range(5):
            fb, pb = (b - 2) // 2 + 1, (b - 2) % 2
            kf[fa, fb, pa * 2 + pb] += k5n[a, b]
    kf16 = jnp.asarray(kf.reshape(3, 3, 4 * C, C), jnp.bfloat16)
    xf = s2d(xs16)
    report("s2d fold 3x3 s1 512ch bf16 DEFAULT",
           time_dispatches(conv_fn(kf16, 1, lax.Precision.DEFAULT), xf, N),
           flops)

    # numeric check (f32)
    y_direct = conv_fn(ks32, 2, lax.Precision.HIGHEST)(xs32)
    y_fold = conv_fn(jnp.asarray(kf.reshape(3, 3, 4 * C, C)), 1,
                     lax.Precision.HIGHEST)(s2d(xs32))
    err = float(jnp.max(jnp.abs(y_direct - y_fold)) /
                jnp.max(jnp.abs(y_direct)))
    print(f"s2d vs direct rel err (f32): {err:.2e}", flush=True)

    if args.quick:
        return

    print(f"\n== g_a per-conv sweep (bf16) ==", flush=True)
    shapes = [(768, 512, 3, 128), (384, 256, 128, 128),
              (192, 128, 128, 128), (96, 64, 128, 192)]
    for prec_nm, pr in [("DEFAULT", lax.Precision.DEFAULT),
                        ("HIGHEST", lax.Precision.HIGHEST)]:
        tot = 0.0
        for (h, w, ci, co) in shapes:
            x = jnp.asarray(rng.standard_normal((B, h, w, ci)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((5, 5, ci, co)) * 0.05,
                            jnp.bfloat16)
            fl = 2 * B * (h // 2) * (w // 2) * 25 * ci * co
            t = time_dispatches(conv_fn(k, 2, pr), x, N)
            tot += t
            print(f"  conv {ci:3d}->{co:3d} @{h}x{w} {prec_nm}: {t*1e3:7.2f} ms"
                  f" {fl/t/1e12:6.2f} TF/s", flush=True)
        print(f"  TOTAL g_a convs {prec_nm}: {tot*1e3:.1f} ms", flush=True)

    print(f"\n== g_s deconv sweep (bf16, lhs_dilation=2) ==", flush=True)
    dshapes = [(48, 32, 192, 128), (96, 64, 128, 128),
               (192, 128, 128, 128), (384, 256, 128, 3)]
    for prec_nm, pr in [("DEFAULT", lax.Precision.DEFAULT),
                        ("HIGHEST", lax.Precision.HIGHEST)]:
        tot = 0.0
        for (h, w, ci, co) in dshapes:
            x = jnp.asarray(rng.standard_normal((B, h, w, ci)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((5, 5, ci, co)) * 0.05,
                            jnp.bfloat16)
            fl = 2 * B * (h * 2) * (w * 2) * 25 * ci * co / 4  # zero-stuffed taps
            p = 2
            f = jax.jit(lambda x, k=k, pr=pr: lax.conv_general_dilated(
                x, k, (1, 1), [(2, 3), (2, 3)], lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=pr))
            t = time_dispatches(f, x, N)
            tot += t
            print(f"  deconv {ci:3d}->{co:3d} @{h}x{w} {prec_nm}: {t*1e3:7.2f} ms"
                  f" {fl/t/1e12:6.2f} TF/s", flush=True)
        print(f"  TOTAL g_s deconvs {prec_nm}: {tot*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
