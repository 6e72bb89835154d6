"""2-process `eval_model --distributed` CLI run: both processes join a
jax.distributed cluster, shard the image list, all-gather per-image metric
records, and process 0's JSON must equal a single-process run's exactly."""

import json
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")

    pid = int(sys.argv[1])
    from compressai_environment_tpu.utils.eval_model.__main__ import main
    main([
        "checkpoint", {dataset!r}, "-a", "bmshj2018-factorized",
        "-p", {ckpt!r},
        "--distributed", "--coordinator", "localhost:{port}",
        "--num-processes", "2", "--process-id", str(pid),
    ])
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from PIL import Image

    import jax

    from compressai_environment_tpu.models import FactorizedPrior
    from compressai_environment_tpu.utils.checkpoint import save_checkpoint

    root = tmp_path_factory.mktemp("dist_eval")
    ds = root / "images"
    ds.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):  # odd count: exercises wrap-around padding
        base = rng.random((8, 12, 3)).astype(np.float32)
        img = np.kron(base, np.ones((8, 8, 1), np.float32))
        Image.fromarray(
            (img.clip(0, 1) * 255).astype(np.uint8)
        ).save(ds / f"im{i}.png")

    m = FactorizedPrior(8, 12).init(key=jax.random.key(5), input_shape=(1, 64, 96, 3))
    m.update(force=True)
    ckpt = root / "ckpt.msgpack"
    save_checkpoint(m, ckpt, architecture="bmshj2018-factorized")
    return ds, ckpt


@pytest.mark.slow
def test_two_process_eval_model_cli(setup, tmp_path, capsys):
    ds, ckpt = setup

    # single-process oracle (in this process)
    from compressai_environment_tpu.utils.eval_model.__main__ import main

    main(["checkpoint", str(ds), "-a", "bmshj2018-factorized", "-p", str(ckpt)])
    oracle = json.loads(capsys.readouterr().out)

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(
        repo=str(REPO), dataset=str(ds), ckpt=str(ckpt), port=port
    ))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=tmp_path,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU runtime unavailable (coordination timeout)")

    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
    # only process 0 prints the report
    dist = json.loads(outs[0][outs[0].index("{"):])
    assert "{" not in outs[1].split("WARNING")[-1].split("}")[-1]

    for k in ("psnr", "ms-ssim", "bpp"):
        np.testing.assert_allclose(
            dist["results"][k], oracle["results"][k], rtol=1e-6,
            err_msg=k,
        )
