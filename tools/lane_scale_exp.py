"""Lane-count scaling experiment for the interleaved-lane coder.

Question (round 4): the per-lane fixed rate cost (2 flush words + count)
means fewer lanes/image = smaller streams. What does lanes/image cost in
wall time, given the scan length T = n/lanes grows inversely? If the scan's
per-step cost scales with vector width (total work constant), fewer lanes
are rate-free; if per-step cost is fixed (dispatch/loop overhead), time
grows linearly as lanes shrink and the scan body needs in-step unrolling.

Measures, for a 24-image Kodak-size batch at the trained checkpoint:
  per lanes/image in {1024, 512, 256, 128}:
    encode_ms (EncodeDeviceHandle + result), decode_ms (decode_batch_device),
    bytes total, implied bpp.

Run on the real TPU:  timeout 900 python tools/lane_scale_exp.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from compressai_environment_tpu.entropy import vrans
    from compressai_environment_tpu.models import FactorizedPrior
    from compressai_environment_tpu.utils.checkpoint import restore_into
    from train_synth import synth_batch

    n_images, h, w = 24, 512, 768
    model = FactorizedPrior(128, 192)
    restore_into(model, os.path.join(
        REPO, "checkpoints", "bmshj2018-factorized-synth-q5.msgpack"))
    model.half()

    x = (synth_batch(1234, n_images, h, w) * 255).round().astype(np.uint8)
    net, cls = model.net, type(model.net)
    cdt = model._compute_dtype
    enc = jax.jit(lambda p, v: net.apply(
        p, v.astype(cdt) / np.asarray(255.0, cdt), method=cls.encode))
    y = jax.block_until_ready(enc({"params": model.params}, jnp.asarray(x)))

    medians = model._medians()
    tables = model.tables["y"]
    b, c = y.shape[0], y.shape[-1]
    symbols = jnp.round(
        y - jnp.asarray(medians).reshape(-1)).astype(jnp.int32).reshape(b, -1)
    indexes = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.int32), y.shape).reshape(b, -1)
    symbols = jax.block_until_ready(symbols)
    n = symbols.shape[1]
    print(f"n_symbols/img={n}", flush=True)

    def best(f, reps=3):
        f()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = f()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3, r

    for lanes in (1024, 512, 256, 128):
        t_enc, blobs = best(lambda: vrans.EncodeDeviceHandle(
            symbols, indexes, tables, lanes=lanes).result())

        def dec():
            out = vrans.decode_batch_device(blobs, indexes, tables)
            jax.block_until_ready(out)
            return out

        t_dec, out = best(dec)
        assert np.array_equal(np.asarray(out), np.asarray(symbols) +
                              np.asarray(tables.offset)[np.asarray(indexes)] * 0
                              ) or True  # decoded == symbols checked below
        ok = bool(np.array_equal(np.asarray(out), np.asarray(symbols)))
        nbytes = sum(len(s) for s in blobs)
        bpp = nbytes * 8 / (n_images * h * w)
        print(
            f"lanes/img={lanes:5d} T={-(-n // lanes):5d} "
            f"enc={t_enc:7.1f}ms dec={t_dec:7.1f}ms "
            f"bytes={nbytes} bpp={bpp:.4f} roundtrip_ok={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
