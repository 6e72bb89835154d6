"""Where does the tpu-format encode phase actually go? (round-4 item 4)

Splits the EB encode (trained flagship, 24x Kodak-size) into:
  E-quant:   symbols/indexes prep dispatch
  E-core:    one-hot select + reverse scan + sort compaction (device, sync)
  E-counts:  counts D2H (the handle's first host sync)
  E-slice:   packed short-slice D2H
  E-pack:    host trim + blob assembly
and also times the fused end-to-end handle for reference, plus decode.

Run: timeout 900 python tools/encode_phase_exp.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def _sync(arr):
    # axon block_until_ready alone does not force execution; a tiny host
    # readback does (cf. bench.py:_sync)
    np.asarray(arr.ravel()[0:1])


def best(f, reps=3):
    f()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, r


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

    tables = model.tables["y"]
    medians = model._medians()
    b, c = y.shape[0], y.shape[-1]

    @jax.jit
    def prep(yv):
        sym = jnp.round(
            yv - jnp.asarray(medians).reshape(-1)
        ).astype(jnp.int32).reshape(b, -1)
        idx = jnp.broadcast_to(
            jnp.arange(c, dtype=jnp.int32), yv.shape
        ).reshape(b, -1)
        return sym, idx

    def run_prep():
        out = prep(y)
        _sync(out[0])
        return out

    dt, (sym, idx) = best(run_prep)
    print(f"E-quant  {dt:7.1f} ms", flush=True)
    n = sym.shape[1]
    lanes = vrans.pick_lanes(n)
    T = -(-n // lanes)
    w_cap = min(max(8, (T * 10) // 16 + 4), T + 2)
    ct = tables.device_compact

    def core():
        out = vrans._encode_device_core_onehot(
            sym, idx, ct["enc_hi"], ct["enc_lo"], T, lanes, w_cap)
        _sync(out[0])
        return out

    dt, out = best(core)
    packed, counts, overflow, esc, raw, raw_counts = out
    print(f"E-core   {dt:7.1f} ms   (T={T} lanes/img={lanes})", flush=True)

    dt, counts_np = best(lambda: np.asarray(counts).astype(np.int64))
    print(f"E-counts {dt:7.1f} ms", flush=True)

    cap_w = min(1 << (max(2, int(counts_np.max())) - 1).bit_length(), w_cap)

    def slice_dl():
        return np.asarray(vrans._slice_packed(packed, cap_w))

    dt, packed_np = best(slice_dl)
    mb = packed_np.nbytes / 1e6
    print(f"E-slice  {dt:7.1f} ms   ({mb:.2f} MB cap_w={cap_w})", flush=True)

    def pack():
        mask = np.arange(cap_w)[:, None] < counts_np[None, :]
        flat = packed_np.T[mask.T]
        return vrans._pack_device_blobs(
            b, n, lanes, counts_np, flat,
            np.zeros((b, 0), np.uint32), np.zeros(b, np.int64))

    dt, blobs = best(pack)
    print(f"E-pack   {dt:7.1f} ms", flush=True)

    dt, blobs2 = best(
        lambda: vrans.EncodeDeviceHandle(sym, idx, tables).result())
    print(f"E-fused  {dt:7.1f} ms   ({sum(len(s) for s in blobs2)} B)",
          flush=True)

    def dec():
        o = vrans.decode_batch_device(blobs2, idx, tables)
        _sync(o)
        return o

    dt, o = best(dec)
    ok = bool(np.array_equal(np.asarray(o), np.asarray(sym)))
    print(f"D-fused  {dt:7.1f} ms   ok={ok}", flush=True)


if __name__ == "__main__":
    main()
