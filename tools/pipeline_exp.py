"""End-to-end pipeline experiments: overlap content upload / encode / decode.

bench.py's round-3 phase table says the wall headline is dominated by the
dev-tunnel content upload (~230 ms of ~540 ms for 24 Kodak-size images);
the encode+decode device work (~310 ms) could hide most of it. Variants:

  P0  current bench.py structure: bulk upload (inside the encode span),
      pipelined two-phase encode over CHUNK-image sub-batches, then decode.
  P1  per-chunk `jax.device_put` issued for ALL chunks up front (async),
      then the same encode/decode phases — upload of chunk i+1 rides under
      compute of chunk i.
  P2  full software pipeline: per chunk, upload -> compress_async; as each
      encode handle resolves, its decode is dispatched immediately — encode
      D2H/host packing, decode H2D/scan and the next chunk's compute all
      overlap.  (Decoded x_hat stays on device, as in bench.py.)
  P3  P2 with a chunk-size sweep.

Each variant checks the bitstreams and reconstructions match P0 exactly.
Run on the TPU: `timeout 1800 python tools/pipeline_exp.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "checkpoints", "bmshj2018-factorized-synth-q5.msgpack")


def content(n, h, w, seed=1234):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from train_synth import synth_batch

    return (synth_batch(seed, n, h, w) * 255).round().astype(np.uint8)


def load_model():
    from compressai_environment_tpu.models import FactorizedPrior
    from compressai_environment_tpu.utils.checkpoint import restore_into

    model = FactorizedPrior(128, 192)
    restore_into(model, CKPT)
    model.stream_format = "tpu"
    model.half()
    return model


def p0(model, x, chunk):
    n = x.shape[0]
    x_dev = jnp.asarray(x)
    chunks = [x_dev[i : i + chunk] for i in range(0, n, chunk)]
    handles = [model.compress_async(ck) for ck in chunks]
    outs = [h.result() for h in handles]
    decs = [model.decompress(o["strings"], o["shape"]) for o in outs]
    for d in decs:
        jax.block_until_ready(d["x_hat"])
    return outs, decs


def p1(model, x, chunk):
    n = x.shape[0]
    chunks = [jax.device_put(x[i : i + chunk]) for i in range(0, n, chunk)]
    handles = [model.compress_async(ck) for ck in chunks]
    outs = [h.result() for h in handles]
    decs = [model.decompress(o["strings"], o["shape"]) for o in outs]
    for d in decs:
        jax.block_until_ready(d["x_hat"])
    return outs, decs


def p2(model, x, chunk):
    n = x.shape[0]
    handles = []
    for i in range(0, n, chunk):
        handles.append(model.compress_async(jax.device_put(x[i : i + chunk])))
    outs, decs = [], []
    for h in handles:
        o = h.result()
        outs.append(o)
        decs.append(model.decompress(o["strings"], o["shape"]))
    for d in decs:
        jax.block_until_ready(d["x_hat"])
    return outs, decs


def p4(model, x, chunk):
    """Per-chunk upload+encode pipeline, ONE batched decode call (kills the
    per-chunk decode RPC overhead: unpack+upload+scan+g_s dispatch once)."""
    n = x.shape[0]
    handles = []
    for i in range(0, n, chunk):
        handles.append(model.compress_async(jax.device_put(x[i : i + chunk])))
    outs = [h.result() for h in handles]
    strings = [s for o in outs for s in o["strings"][0]]
    dec = model.decompress([strings], outs[0]["shape"])
    jax.block_until_ready(dec["x_hat"])
    decs = [
        {"x_hat": dec["x_hat"][i : i + chunk]} for i in range(0, n, chunk)
    ]
    return outs, decs


def time_variant(fn, model, x, chunk, reps=4):
    fn(model, x, chunk)  # warm (compile at these shapes)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(model, x, chunk)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    n, h, w = 24, 512, 768
    model = load_model()
    x = content(n, h, w)
    mb = x.nbytes / 1e6

    t0, (outs0, decs0) = time_variant(p0, model, x, 6)
    print(f"P0 bulk-upload 2-phase       chunk=6 : {t0*1e3:7.1f} ms  {mb/t0:6.1f} MB/s")

    ref_strings = [s for o in outs0 for s in o["strings"][0]]
    ref_hat = np.concatenate([np.asarray(d["x_hat"], np.float32) for d in decs0])

    for name, fn, chunk in [
        ("P1 per-chunk upload 2-phase", p1, 6),
        ("P2 full pipeline", p2, 6),
        ("P4 pipelined enc, one decode", p4, 6),
        ("P4 pipelined enc, one decode", p4, 4),
        ("P4 pipelined enc, one decode", p4, 8),
    ]:
        t, (outs, decs) = time_variant(fn, model, x, chunk)
        strings = [s for o in outs for s in o["strings"][0]]
        hat = np.concatenate([np.asarray(d["x_hat"], np.float32) for d in decs])
        # bitstreams must be byte-identical; x_hat only within bf16 conv
        # tolerance (XLA picks different accumulation orders per batch shape)
        err = float(np.abs(hat - ref_hat).max())
        ok = strings == ref_strings and err < 1e-2
        print(
            f"{name:28s} chunk={chunk}: {t*1e3:7.1f} ms  {mb/t:6.1f} MB/s  "
            f"streams-exact={strings == ref_strings} max|dx|={err:.1e}"
        )
        assert ok, name


if __name__ == "__main__":
    main()
