"""Multi-device scaling benchmark: encode+decode MB/s vs device count.

Run on hardware with multiple devices (pod slice or
``--xla_force_host_platform_device_count`` CPU mesh) to measure
data-parallel scaling efficiency of the codec path:

    python bench_scaling.py            # all devices
    python bench_scaling.py 1 2 4 8    # specific device counts

Prints one JSON line per device count plus a final efficiency summary
(BASELINE target: >= 80% at the largest count).
"""

import json
import sys
import time

import numpy as np


def run(n_devices: int, images_per_device: int = 4, h: int = 512, w: int = 768):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from compressai_environment_tpu.models import FactorizedPrior
    from compressai_environment_tpu.parallel import make_mesh
    from compressai_environment_tpu.parallel.mesh import compress_data_parallel

    mesh = make_mesh(n_devices, tp=1)
    model = FactorizedPrior(128, 192).init(
        key=jax.random.key(0), input_shape=(1, h, w, 3)
    )
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

    c = compress_data_parallel(model, x, mesh)  # warmup/compile
    model.decompress(c["strings"], c["shape"])

    t0 = time.perf_counter()
    c = compress_data_parallel(model, x, mesh)
    out = model.decompress(c["strings"], c["shape"])
    jax.block_until_ready(out["x_hat"])
    dt = time.perf_counter() - t0

    mb = n_images * h * w * 3 / 1e6
    return {"devices": n_devices, "images": n_images, "MBps": round(mb / dt, 3),
            "seconds": round(dt, 3)}


def main(argv):
    import jax

    avail = jax.device_count()
    counts = [int(a) for a in argv] if argv else sorted(
        {1, max(1, avail // 2), avail}
    )
    results = []
    for n in counts:
        if n > avail:
            continue
        r = run(n)
        results.append(r)
        print(json.dumps(r))

    if len(results) > 1:
        base = results[0]
        top = results[-1]
        eff = (top["MBps"] / base["MBps"]) / (top["devices"] / base["devices"])
        print(json.dumps({
            "metric": "dp scaling efficiency",
            "value": round(eff, 3),
            "from_devices": base["devices"],
            "to_devices": top["devices"],
        }))


if __name__ == "__main__":
    main(sys.argv[1:])
