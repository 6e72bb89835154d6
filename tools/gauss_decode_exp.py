"""Wide-table (Gaussian) coder cores: folded one-hot vs packed sf-gather.

Round-4 VERDICT item 3: the 64-row Gaussian scale table (stride ~3100) — the
y-latent decode of every hyperprior-family model — previously rode the
sf-gather scan (gather-latency-bound). The fold (vrans.build_folded_rows)
re-expresses wide rows as coarse CDFs with 2^k-divisible bucket freqs so the
one-hot MXU cores apply. This measures both cores on the same symbol set on
the real TPU:  timeout 900 python tools/gauss_decode_exp.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from compressai_environment_tpu.entropy import vrans
    from compressai_environment_tpu.entropy_models.base import CdfTables
    from compressai_environment_tpu.entropy_models.gaussian import (
        build_tables, get_scale_table,
    )

    t_fold = build_tables(get_scale_table())
    # sf-gather baseline: identical CdfTables with the compact path disabled
    t_sf = CdfTables(t_fold.quantized_cdf, t_fold.cdf_length, t_fold.offset)
    object.__setattr__(t_sf, "_device_compact", None)
    assert t_fold.device_compact is not None and t_sf.device_packed is not None

    # hyperprior y-shaped workload: 8 Kodak-size images, M=192 latents,
    # scale indexes skewed low like natural content (most scales small)
    B, n = 8, 32 * 48 * 192
    rng = np.random.default_rng(0)
    rows = np.minimum(
        np.abs(rng.normal(8, 10, size=(B, n))), 63
    ).astype(np.int32)
    scales = get_scale_table()[rows]
    symbols = np.round(rng.normal(0.0, scales)).astype(np.int32)
    sym_dev = jnp.asarray(symbols)
    idx_dev = jnp.asarray(rows)

    def best(f, reps=3):
        f()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = f()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3, r

    for name, t in (("sf-gather", t_sf), ("folded-onehot", t_fold)):
        enc_ms, blobs = best(
            lambda: vrans.encode_batch_device(sym_dev, idx_dev, t)
        )

        def dec():
            out = vrans.decode_batch_device(blobs, idx_dev, t)
            jax.block_until_ready(out)
            return out

        dec_ms, out = best(dec)
        ok = bool(np.array_equal(np.asarray(out), symbols))
        nbytes = sum(len(b) for b in blobs)
        print(
            f"{name:14s} enc={enc_ms:7.1f}ms dec={dec_ms:7.1f}ms "
            f"bytes={nbytes} ok={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
