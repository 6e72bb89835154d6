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

    Two knobs, mirroring where training converges: (1) scale the last
    analysis conv so the quantized-latent entropy lands near the target —
    for M latent channels at transform stride 16 there are M/256 symbols
    per pixel, and a rounded N(0, s) symbol carries ~½·log2(2πe·s²) bits;
    (2) bake *empirical* per-channel CDFs from the sample latents' symbol
    histograms (a trained EntropyBottleneck's density converges to exactly
    this data distribution; a random-init density costs ~3 bpp of
    cross-entropy mismatch that no scalar sharpness knob can remove). The
    symbol count — and thus the coding work per image — is
    shape-determined and unaffected; only the probabilities change."""
    import numpy as _np

    h, w = x_sample.shape[1:3]

    def measure_bpp():
        c = model.compress(x_sample)
        return sum(len(s) for s in c["strings"][0]) * 8 / (
            x_sample.shape[0] * h * w
        )

    import jax.numpy as jnp

    from compressai_environment_tpu.entropy.cdf import pmf_to_quantized_cdf
    from compressai_environment_tpu.entropy_models.base import CdfTables

    M = model.M
    bits_per_symbol = target_bpp * 256.0 / M
    # invert H = 0.5*log2(2*pi*e*s^2)  (valid for s >~ 0.5)
    target_std = max(0.3, float(2.0 ** bits_per_symbol / _np.sqrt(2 * _np.pi * _np.e)))
    encode = model._jitted(
        "encode",
        lambda p, v: model.net.apply(p, v, method=type(model.net).encode),
    )

    def latents():
        return _np.asarray(
            encode({"params": model.params}, model._nhwc(x_sample)), _np.float32
        )

    def scale_latents(factor):
        leaf = model.params["g_a"]["6"]
        leaf["kernel"] = leaf["kernel"] * factor
        leaf["bias"] = leaf["bias"] * factor

    def bake_empirical():
        y = latents()
        med = model._medians()
        sym = _np.round(y - med.reshape(1, 1, 1, -1)).astype(_np.int64)
        # widen the observed range by 1 so near-range symbols on unseen
        # images stay in-band; anything further escapes (raw residual)
        mins = sym.min(axis=(0, 1, 2)) - 1
        maxs = sym.max(axis=(0, 1, 2)) + 1
        lengths = (maxs - mins + 1).astype(_np.int64)
        max_len = int(lengths.max())
        cdf = _np.zeros((M, max_len + 2), _np.int32)
        tail = _np.float32(2.0 ** -15)
        ent = _np.zeros(M)
        for c in range(M):
            hist = _np.bincount(
                (sym[..., c].ravel() - mins[c]), minlength=lengths[c]
            ).astype(_np.float64)
            p = hist / hist.sum()
            nz = p > 0
            ent[c] = -(p[nz] * _np.log2(p[nz])).sum()
            row = pmf_to_quantized_cdf(
                _np.concatenate([(1.0 - tail) * p, [tail]]).astype(_np.float32)
            )
            cdf[c, : len(row)] = row
        model.tables["y"] = CdfTables(cdf, lengths + 2, mins)
        return float(ent.mean())

    scale = float(target_std / (latents().std() + 1e-9))
    scale_latents(scale)
    mean_bits = bake_empirical()
    # one correction step: per-channel entropy moves ~1 bit per std doubling
    correction = float(2.0 ** (bits_per_symbol - mean_bits))
    correction = min(max(correction, 0.25), 4.0)
    scale_latents(correction)
    mean_bits = bake_empirical()
    return {
        "latent_scale": round(scale * correction, 4),
        "target_std": round(target_std, 3),
        "empirical_bits_per_symbol": round(mean_bits, 3),
        "calibrated_bpp": round(measure_bpp(), 3),
    }


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
    cdt = model._compute_dtype
    enc = jax.jit(
        lambda p, v: net.apply(p, v.astype(cdt) / np.asarray(255.0, cdt), method=cls.encode)
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
        lambda: jax.block_until_ready(
            dec({"params": model.params}, jnp.asarray(y_back, cdt))
        )
    )
    phases["g_s"] = round(dt, 1)
    phases["stream_bytes"] = total_bytes
    # chip-bound aggregate: what the same pipeline costs once the dev-tunnel
    # link phases (content upload, stream D2H/H2D — >10 GB/s on a real host)
    # are excluded. The decode-scan phase keeps its H2D share here, so this
    # is a conservative lower bound on chip throughput.
    chip_ms = phases["g_a"] + phases["quantize_scan_compact_d2h"] + \
        phases["h2d_unpack_decode_scan"] + phases["g_s"]
    phases["chip_bound_MBps_lower_bound"] = round(
        x.nbytes / 1e6 / (chip_ms / 1e3), 1
    )
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
    # bf16 transforms (the TPU-native half mode, a supported eval path —
    # --half in eval_model): MXU convs at double rate; coding stays
    # integer-exact because encoder and decoder quantize the same latents.
    # Tables were baked in fp32 above, as half() requires.
    model.half()
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

    # two-stage hyperprior (bmshj2018-hyperprior): z coded by the factorized
    # bottleneck, y by the Gaussian conditional with decoder-side scales
    # (BASELINE.md row: ~0.70 s enc / ~0.91 s dec per image on CPU)
    from compressai_environment_tpu.models import ScaleHyperprior

    hp = ScaleHyperprior(128, 192).init(
        key=jax.random.key(2), input_shape=(1, h, w, 3)
    )
    hp.update(force=True)
    hp.stream_format = "tpu"
    HP_B = 8
    xh = x[:HP_B]
    for _ in range(2):
        ch = hp.compress(xh)
        dh = hp.decompress(ch["strings"], ch["shape"])
        jax.block_until_ready(dh["x_hat"])
    t0 = time.perf_counter()
    ch = hp.compress(xh)
    t1 = time.perf_counter()
    dh = hp.decompress(ch["strings"], ch["shape"])
    jax.block_until_ready(dh["x_hat"])
    t2 = time.perf_counter()
    hp_enc, hp_dec = (t1 - t0) / HP_B, (t2 - t1) / HP_B

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
                    "transforms_dtype": "bfloat16",
                    "hyperprior_encode_s_per_img": round(hp_enc, 3),
                    "hyperprior_decode_s_per_img": round(hp_dec, 3),
                    "hyperprior_ref_cpu_enc_dec_s": [0.70, 0.91],
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
