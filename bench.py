"""Driver benchmark: end-to-end encode+decode throughput on TPU.

Measures the full bmshj2018-factorized pipeline (g_a on TPU -> rANS encode on
host -> rANS decode on host -> g_s on TPU) over a Kodak-sized batch
(24 x 768x512 RGB) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline: the reference CompressAI bmshj2018-factorized CPU pipeline at
~0.74 MB/s aggregate enc+dec (BASELINE.md: ~0.7 s encode + ~0.9 s decode per
768x512 image, 1.18 MB/image).
"""

import json
import time

import numpy as np

BASELINE_MBPS = 1.18 / 1.6  # reference enc+dec MB/s per image slot


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

    rng = np.random.default_rng(0)
    # smooth, image-like content: random low-frequency fields; uint8 like a
    # real decoded image buffer (scaled to [0,1] on device)
    base = rng.random((n_images, h // 16, w // 16, 3), dtype=np.float32)
    x = (
        np.clip(
            np.stack([np.kron(b, np.ones((16, 16, 1), np.float32)) for b in base]),
            0, 1,
        ) * 255
    ).round().astype(np.uint8)

    # warmup (compile at the exact benchmark shapes; twice — the first
    # post-compile iteration still pays tunnel-side executable caching)
    for _ in range(2):
        c = model.compress(x)
        model.decompress(c["strings"], c["shape"])

    t0 = time.perf_counter()
    c = model.compress(x)
    t1 = time.perf_counter()
    out = model.decompress(c["strings"], c["shape"])
    # decoded images stay device-resident (consumers compute metrics /
    # display from device); sync only
    jax.block_until_ready(out["x_hat"])
    t2 = time.perf_counter()

    total_mb = n_images * h * w * 3 / 1e6
    enc_t, dec_t = t1 - t0, t2 - t1
    mbps = total_mb / (enc_t + dec_t)

    # autoregressive model (mbt2018) single-image wavefront timings
    from compressai_environment_tpu.models import (
        JointAutoregressiveHierarchicalPriors,
    )

    ar = JointAutoregressiveHierarchicalPriors(192, 192).init(
        key=jax.random.key(1), input_shape=(1, h, w, 3)
    )
    ar.update(force=True)
    ar.stream_format = "tpu"
    xa = x[:1]
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
    ar_enc, ar_dec = t1 - t0, t2 - t1

    print(
        json.dumps(
            {
                "metric": "bmshj2018-factorized enc+dec throughput (Kodak-size x24, 1 chip)",
                "value": round(mbps, 3),
                "unit": "MB/s",
                "vs_baseline": round(mbps / BASELINE_MBPS, 2),
                "detail": {
                    "encode_s": round(enc_t, 3),
                    "decode_s": round(dec_t, 3),
                    "total_MB": round(total_mb, 2),
                    "mean_bpp": round(
                        sum(len(s) for s in c["strings"][0]) * 8 / (n_images * h * w), 4
                    ),
                    "mbt2018_ar_encode_s_per_img": round(ar_enc, 3),
                    "mbt2018_ar_decode_s_per_img": round(ar_dec, 3),
                    "mbt2018_ref_cuda_enc_dec_s": [2.7, 5.9],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
