"""Driver benchmark: end-to-end encode+decode throughput on TPU.

Measures the full bmshj2018-factorized pipeline over a Kodak-sized batch
(24 x 768x512 RGB), pipelined over sub-batches so stream D2H overlaps the
next chunk's compute, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N,
     "detail": {..., "phases_ms": {...}}}

The per-phase breakdown (measured with forced syncs) shows where time goes:
content H2D upload, g_a, quantize+rANS scan+compaction, stream D2H, host
pack, stream H2D, decode scan (gather-bound — see docs/performance.md for
the measured per-symbol gather floor), g_s.

Baseline: the reference CompressAI bmshj2018-factorized CPU pipeline at
~0.74 MB/s aggregate enc+dec (BASELINE.md: ~0.7 s encode + ~0.9 s decode per
768x512 image, 1.18 MB/image).
"""

import json
import time

import numpy as np

BASELINE_MBPS = 1.18 / 1.6  # reference enc+dec MB/s per image slot
CHUNK = 6  # images per pipelined sub-batch


def _content(n_images, h, w):
    rng = np.random.default_rng(0)
    # smooth, image-like content: random low-frequency fields; uint8 like a
    # real decoded image buffer (scaled to [0,1] on device)
    base = rng.random((n_images, h // 16, w // 16, 3), dtype=np.float32)
    return (
        np.clip(
            np.stack([np.kron(b, np.ones((16, 16, 1), np.float32)) for b in base]),
            0, 1,
        ) * 255
    ).round().astype(np.uint8)


def _calibrate_rate(model, x_sample, target_bpp=1.0):
    """Calibrate the random-init model to a realistic trained-codec operating
    rate (published Kodak rates are 0.1-1.8 bpp; uncalibrated random init
    codes at >4 bpp, inflating stream transfer cost out of proportion).

    Two knobs, mirroring what training does: (1) scale the last analysis
    conv so latents are ~unit scale; (2) sharpen the EntropyBottleneck
    density (additive shift on the pre-softplus ``_matrix0``, which
    multiplies the cumulative-logit slope) until the measured bpp hits the
    target, rebaking CDF tables per probe. The symbol count — and thus the
    coding work per image — is shape-determined and unaffected."""
    import numpy as _np

    h, w = x_sample.shape[1:3]

    def measure_bpp():
        c = model.compress(x_sample)
        return sum(len(s) for s in c["strings"][0]) * 8 / (
            x_sample.shape[0] * h * w
        )

    # knob 1: unit-scale latents
    import jax.numpy as jnp

    encode = model._jitted(
        "encode",
        lambda p, v: model.net.apply(p, v, method=type(model.net).encode),
    )
    y = encode({"params": model.params}, model._nhwc(x_sample))
    scale = float(1.0 / (_np.asarray(jnp.std(y)) + 1e-9))
    leaf = model.params["g_a"]["6"]
    leaf["kernel"] = leaf["kernel"] * scale
    leaf["bias"] = leaf["bias"] * scale

    # knob 2: density sharpness
    eb = model.params["entropy_bottleneck"]
    m0_saved = eb["_matrix0"]

    def bpp_at(delta):
        eb["_matrix0"] = m0_saved + delta
        model.update(force=True)
        return measure_bpp()

    lo, hi = 0.0, 8.0
    for _ in range(7):
        mid = 0.5 * (lo + hi)
        if bpp_at(mid) > target_bpp:
            lo = mid  # sharper needed
        else:
            hi = mid
    delta = 0.5 * (lo + hi)
    eb["_matrix0"] = m0_saved + delta
    model.update(force=True)
    return {"latent_scale": round(scale, 4), "sharpness": round(delta, 3),
            "calibrated_bpp": round(bpp_at(delta), 3)}


def _sync(arr):
    import jax

    jax.block_until_ready(arr)
    np.asarray(arr.ravel()[0:1])  # force a real host round trip


def _pipelined_encode(model, chunks):
    handles = [model.compress_async(ck) for ck in chunks]
    return [h.result() for h in handles]


def _pipelined_decode(model, outs):
    decs = [model.decompress(o["strings"], o["shape"]) for o in outs]
    for d in decs:
        pass  # dispatch only; decoded images stay device-resident
    _sync(decs[-1]["x_hat"])
    import jax

    for d in decs:
        jax.block_until_ready(d["x_hat"])
    return decs


def _phase_breakdown(model, x, chunks):
    """Measured per-phase timings (ms) with forced syncs; explains the
    pipelined number and names the next optimization target."""
    import jax
    import jax.numpy as jnp

    from compressai_environment_tpu.entropy_models import bottleneck as eb_ops

    phases = {}

    def best(f, n=3):
        f()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = f()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3, r

    dt, x_dev = best(lambda: jax.block_until_ready(jnp.asarray(x)))
    phases["h2d_content_upload"] = round(dt, 1)

    net, cls = model.net, type(model.net)
    enc = jax.jit(
        lambda p, v: net.apply(p, v.astype(jnp.float32) / 255.0, method=cls.encode)
    )
    dt, y_dev = best(lambda: jax.block_until_ready(enc({"params": model.params}, x_dev)))
    phases["g_a"] = round(dt, 1)

    def enc_core():
        h = eb_ops.compress_async(y_dev, model._medians(), model.tables["y"])
        return h.result()

    dt, strings = best(enc_core)
    phases["quantize_scan_compact_d2h"] = round(dt, 1)
    total_bytes = sum(len(s) for s in strings)

    dt, y_back = best(
        lambda: jax.block_until_ready(
            eb_ops.decompress(
                strings, y_dev.shape[1:3], model._medians(), model.tables["y"],
                fmt="tpu",
            )
        )
    )
    phases["h2d_unpack_decode_scan"] = round(dt, 1)

    dec = jax.jit(lambda p, v: net.apply(p, v, method=cls.decode))
    dt, _ = best(
        lambda: jax.block_until_ready(dec({"params": model.params}, jnp.asarray(y_back)))
    )
    phases["g_s"] = round(dt, 1)
    phases["stream_bytes"] = total_bytes
    return phases


def main():
    import jax

    # persistent compile cache: repeat runs skip the (minutes-long on this
    # 2-core host) XLA compiles and measure only execution
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from compressai_environment_tpu.models import FactorizedPrior

    n_images, h, w = 24, 512, 768
    model = FactorizedPrior(128, 192).init(
        key=jax.random.key(0), input_shape=(1, h, w, 3)
    )
    model.update(force=True)
    model.stream_format = "tpu"  # interleaved-lane on-chip coder

    x = _content(n_images, h, w)
    rate_scale = _calibrate_rate(model, x[:4])
    chunks = [x[i : i + CHUNK] for i in range(0, n_images, CHUNK)]

    # warmup (compile at the exact benchmark shapes; twice — the first
    # post-compile iteration still pays tunnel-side executable caching)
    for _ in range(2):
        outs = _pipelined_encode(model, chunks)
        _pipelined_decode(model, outs)

    t0 = time.perf_counter()
    outs = _pipelined_encode(model, chunks)
    t1 = time.perf_counter()
    _pipelined_decode(model, outs)
    t2 = time.perf_counter()

    total_mb = n_images * h * w * 3 / 1e6
    enc_t, dec_t = t1 - t0, t2 - t1
    mbps = total_mb / (enc_t + dec_t)

    phases = _phase_breakdown(model, x, chunks)

    # autoregressive model (mbt2018) wavefront timings
    from compressai_environment_tpu.models import (
        JointAutoregressiveHierarchicalPriors,
    )

    ar = JointAutoregressiveHierarchicalPriors(192, 192).init(
        key=jax.random.key(1), input_shape=(1, h, w, 3)
    )
    ar.update(force=True)
    ar.stream_format = "tpu"
    AR_B = 8  # all images ride the same wavefront in one program
    xa = x[:AR_B]
    for _ in range(2):
        ca = ar.compress(xa)
        da = ar.decompress(ca["strings"], ca["shape"])
        jax.block_until_ready(da["x_hat"])
    t0 = time.perf_counter()
    ca = ar.compress(xa)
    t1 = time.perf_counter()
    da = ar.decompress(ca["strings"], ca["shape"])
    jax.block_until_ready(da["x_hat"])
    t2 = time.perf_counter()
    ar_enc, ar_dec = (t1 - t0) / AR_B, (t2 - t1) / AR_B

    print(
        json.dumps(
            {
                "metric": "bmshj2018-factorized enc+dec throughput (Kodak-size x24, 1 chip, pipelined)",
                "value": round(mbps, 3),
                "unit": "MB/s",
                "vs_baseline": round(mbps / BASELINE_MBPS, 2),
                "detail": {
                    "encode_s": round(enc_t, 3),
                    "decode_s": round(dec_t, 3),
                    "total_MB": round(total_mb, 2),
                    "mean_bpp": round(
                        sum(
                            len(s)
                            for o in outs
                            for s in o["strings"][0]
                        ) * 8 / (n_images * h * w), 4
                    ),
                    "phases_ms": phases,
                    "rate_calibration": rate_scale,
                    "mbt2018_ar_batch": AR_B,
                    "mbt2018_ar_encode_s_per_img": round(ar_enc, 3),
                    "mbt2018_ar_decode_s_per_img": round(ar_dec, 3),
                    "mbt2018_ref_cuda_enc_dec_s": [2.7, 5.9],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
