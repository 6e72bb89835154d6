"""Chunked one-hot encode-stage experiment.

The encode core's (start, freq, esc, raw) selection stage (E3 in
tools/encode_core_exp.py, ~34 ms / 24 Kodak-size images) materializes the
row-selected table `ext` — (n, 2S+2) f32 ~ 460 MB per image — in HBM and
reads it back for the column select, so the stage is HBM-bandwidth-bound,
not MXU-bound. Chunking the position axis so each chunk's intermediates fit
VMEM turns the round trip into on-chip traffic.

Variants:
  C0   current: lax.map over images, whole image per step
  C[k] lax.map over (B*n / k) position chunks of size k

Run on the TPU: `timeout 900 python tools/encode_chunk_exp.py`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from compressai_environment_tpu.entropy import vrans
from tools.decode_core_exp import build_workload, timed


def select_stage(sym, idx, enc_hi, enc_lo, R, S1):
    ext = vrans._exact_select(vrans._onehot_rows(idx, R), enc_hi, enc_lo)
    off = ext[:, -2].astype(jnp.int32) - 32768
    maxv = ext[:, -1].astype(jnp.int32)
    value = sym - off
    esc = (value < 0) | (value >= maxv)
    raw = jnp.where(value < 0, (-2 * value - 1), 2 * (value - maxv)
                    ).astype(jnp.uint32)
    coded = jnp.where(esc, maxv, value)
    colsel = (coded[:, None] == jnp.arange(S1, dtype=jnp.int32)
              ).astype(jnp.float32)
    start = jnp.sum(ext[:, :S1] * colsel, axis=1)
    freq = jnp.sum(ext[:, S1:2 * S1] * colsel, axis=1)
    return start.astype(jnp.uint32), freq.astype(jnp.uint32), esc, raw


def main():
    tables, symbols, indexes, lanes = build_workload()
    B, n = symbols.shape
    ct = tables.device_compact
    enc_hi, enc_lo = ct["enc_hi"], ct["enc_lo"]
    R = enc_hi.shape[0]
    S1 = (enc_hi.shape[1] - 2) // 2
    print(f"workload: B={B} n={n} R={R} S1={S1}")

    symbols_dev = jnp.asarray(symbols)
    indexes_dev = jnp.asarray(indexes)

    @jax.jit
    def c0(symbols, indexes):
        return jax.lax.map(
            lambda a: select_stage(a[0], a[1], enc_hi, enc_lo, R, S1),
            (symbols, indexes),
        )

    dt0, ref = timed(lambda: c0(symbols_dev, indexes_dev))
    print(f"C0 per-image map:            {dt0:8.1f} ms")
    ref = jax.tree.map(np.asarray, ref)

    for chunk in (2048, 4096, 8192, 16384, 32768):
        if (B * n) % chunk:
            continue

        @jax.jit
        def ck(symbols, indexes, chunk=chunk):
            sy = symbols.reshape(-1, chunk)
            ix = indexes.reshape(-1, chunk)
            out = jax.lax.map(
                lambda a: select_stage(a[0], a[1], enc_hi, enc_lo, R, S1),
                (sy, ix),
            )
            return jax.tree.map(lambda a: a.reshape(B, n), out)

        dt, out = timed(lambda: ck(symbols_dev, indexes_dev))
        out = jax.tree.map(np.asarray, out)
        ok = all(
            (a == b).all() for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out))
        )
        print(f"C{chunk:<6d} chunked map:       {dt:8.1f} ms   exact={ok}")


if __name__ == "__main__":
    main()
