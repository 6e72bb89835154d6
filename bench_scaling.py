"""Multi-device scaling report: encode+decode MB/s/chip vs (chips, hosts).

Emits the BASELINE.md report format — one JSON line per (chips, hosts)
configuration with MB/s/chip and efficiency vs the smallest configuration —
so a real pod run needs zero code changes:

    # single host, all local devices
    python bench_scaling.py 1 2 4 8
    # multi-host (run on every host of the slice; proc 0 prints)
    python bench_scaling.py --distributed --num-processes H --process-id I

On a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N)
the wall-clock is oversubscription noise, so rows carry
``wall_meaningful: false`` and the report adds the evidence that IS valid
there: per-device FLOPs partitioning of the compiled encode AND decode
executables (must fall ~1/dp) and the collective inventory of the sharded
codec modules (what actually rides the ICI on real hardware).
"""

import json
import sys
import time

import numpy as np


def _flops(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0))


def _collectives(hlo_text: str) -> dict:
    import re

    counts = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        n = len(re.findall(rf"= \S+ {op}(?:-start)?\(", hlo_text))
        if n:
            counts[op] = n
    return counts


def run(n_devices: int, images_per_device: int = 4, h: int = 512, w: int = 768,
        analyze: bool = False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from compressai_environment_tpu.models import FactorizedPrior
    from compressai_environment_tpu.parallel import make_mesh
    from compressai_environment_tpu.parallel.mesh import (
        batch_sharding,
        compress_data_parallel,
        decompress_data_parallel,
    )

    mesh = make_mesh(n_devices, tp=1)
    model = FactorizedPrior(128, 192)
    import os

    ck = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "checkpoints", "bmshj2018-factorized-synth-q5.msgpack")
    if os.path.exists(ck):
        from compressai_environment_tpu.utils.checkpoint import restore_into

        restore_into(model, ck)
    else:
        model = model.init(key=jax.random.key(0), input_shape=(1, h, w, 3))
        model.update(force=True)
    model.stream_format = "tpu"

    n_images = n_devices * images_per_device
    rng = np.random.default_rng(0)
    base = rng.random((n_images, h // 16, w // 16, 3), dtype=np.float32)
    x = (
        np.clip(
            np.stack([np.kron(b, np.ones((16, 16, 1), np.float32)) for b in base]),
            0, 1,
        ) * 255
    ).round().astype(np.uint8)

    def roundtrip():
        c = compress_data_parallel(model, x, mesh)
        out = decompress_data_parallel(model, c["strings"], c["shape"], mesh)
        jax.block_until_ready(out["x_hat"])
        return c, out

    roundtrip()  # warmup/compile
    t0 = time.perf_counter()
    roundtrip()
    dt = time.perf_counter() - t0

    mb = n_images * h * w * 3 / 1e6
    platform = jax.devices()[0].platform
    import os

    wall_meaningful = platform != "cpu" or n_devices <= max(
        1, (os.cpu_count() or 1) // 2
    )
    row = {
        "report": "codec-dp-scaling",
        "chips": n_devices,
        "hosts": jax.process_count(),
        "images": n_images,
        "MBps_total": round(mb / dt, 3),
        "MBps_per_chip": round(mb / dt / n_devices, 3),
        "seconds": round(dt, 3),
        "platform": platform,
        "wall_meaningful": wall_meaningful,
    }
    if analyze and n_devices > 1:
        # compile-level evidence for the virtual mesh: per-device FLOPs
        # partitioning + collective inventory of the sharded executables
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        net, cls = model.net, type(model.net)
        xs = jax.device_put(x, batch_sharding(mesh))
        enc_c = (
            jax.jit(lambda p, v: net.apply(
                p, v.astype(jnp.float32) / 255.0, method=cls.encode))
            .lower({"params": model.params}, xs).compile()
        )
        ys = jax.device_put(
            np.zeros((n_images, h // 16, w // 16, 192), np.float32),
            batch_sharding(mesh),
        )
        dec_c = (
            jax.jit(lambda p, v: net.apply(p, v, method=cls.decode))
            .lower({"params": model.params}, ys).compile()
        )
        enc_1 = (  # unsharded single-device reference
            jax.jit(lambda p, v: net.apply(
                p, v.astype(jnp.float32) / 255.0, method=cls.encode))
            .lower({"params": model.params}, jnp.asarray(x)).compile()
        )
        row["flops_partition"] = {
            "encode_per_device_reduction_x": round(
                _flops(enc_1) / max(_flops(enc_c), 1.0), 2
            ),
            "ideal_x": n_devices,
        }
        row["collectives"] = {
            "encode": _collectives(enc_c.as_text()),
            "decode": _collectives(dec_c.as_text()),
        }
    return row


def main(argv):
    import argparse

    from compressai_environment_tpu.parallel.distributed import (
        add_distributed_args,
        maybe_initialize,
    )

    p = argparse.ArgumentParser()
    p.add_argument("counts", nargs="*", type=int,
                   help="chip counts to benchmark (default: 1, half, all)")
    p.add_argument("--images-per-device", type=int, default=4)
    p.add_argument("--analyze", action="store_true",
                   help="add FLOPs-partition + collective inventory "
                        "(automatic on CPU virtual meshes)")
    add_distributed_args(p)
    args = p.parse_args(argv)
    proc_idx, _ = maybe_initialize(args)

    import jax

    avail = jax.device_count()
    counts = args.counts or sorted({1, max(1, avail // 2), avail})
    analyze = args.analyze or jax.devices()[0].platform == "cpu"
    results = []
    for n in counts:
        if n > avail:
            continue
        r = run(n, images_per_device=args.images_per_device, analyze=analyze)
        results.append(r)
        if proc_idx == 0:
            print(json.dumps(r), flush=True)

    if len(results) > 1 and proc_idx == 0:
        base, top = results[0], results[-1]
        eff = (top["MBps_per_chip"] / base["MBps_per_chip"]) * 100
        print(json.dumps({
            "report": "codec-dp-scaling-summary",
            "metric": "MB/s/chip efficiency",
            "value_pct": round(eff, 1),
            "from": {"chips": base["chips"], "hosts": base["hosts"],
                     "MBps_per_chip": base["MBps_per_chip"]},
            "to": {"chips": top["chips"], "hosts": top["hosts"],
                   "MBps_per_chip": top["MBps_per_chip"]},
            "target_pct": 80.0,
            "wall_meaningful": top["wall_meaningful"],
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
