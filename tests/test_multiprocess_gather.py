"""Real 2-process bitstream gather: spawns two local processes that join a
``jax.distributed`` cluster over localhost (CPU backend) and round-trip
``gather_bitstreams`` — the path that is short-circuited in single-process
runs (``parallel/gather.py``). Verifies deterministic (process, local-index)
ordering and exact byte recovery of variable-length streams."""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    sys.path.insert(0, {repo!r})
    import jax

    pid = int(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address="localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    from compressai_environment_tpu.parallel.gather import gather_bitstreams

    # variable-length, process-distinct payloads
    local = [bytes([pid]) * (3 + 5 * i + pid) for i in range(3)]
    merged = gather_bitstreams(local)
    expect = [bytes([p]) * (3 + 5 * i + p) for p in range(2) for i in range(3)]
    assert jax.process_count() == 2, jax.process_count()
    assert merged == expect, [len(m) for m in merged]
    print(f"proc {{pid}} ok {{len(merged)}} streams")
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_gather(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=str(REPO), port=port))

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=tmp_path,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU runtime unavailable (coordination timeout)")

    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "proc 0 ok 6 streams" in outs[0]
    assert "proc 1 ok 6 streams" in outs[1]
