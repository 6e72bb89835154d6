"""eval_model golden-JSON regression (reference pattern:
``tests/test_eval_model.py:77-124``, rtol/atol 1e-4 against
``tests/expected/eval_*.json``), exercised for BOTH stream formats:
"ans" (reference-bit-exact host rANS) and "tpu" (on-chip lanes).

Fixtures are deterministic: a seeded fake dataset and a seeded exported
checkpoint. ``GENERATE_EXPECTED=1`` rewrites them."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

EXPECTED = Path(__file__).parent / "expected"
GENERATE = os.environ.get("GENERATE_EXPECTED") == "1"

NUMERIC_KEYS = ("psnr", "ms-ssim", "bpp")  # timings are machine-dependent


@pytest.fixture(autouse=True)
def _restore_global_coder():
    """The CLI sets the process-global coder registry; restore it so other
    tests see the default."""
    import compressai_environment_tpu as cai

    saved = cai.get_entropy_coder()
    yield
    cai.set_entropy_coder(saved)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("eval_golden_ds")
    rng = np.random.default_rng(42)
    for i in range(2):
        base = rng.random((16, 24, 3), dtype=np.float32)
        arr = np.clip(np.kron(base, np.ones((8, 8, 1), np.float32)), 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(root / f"g{i}.png")
    return root


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    import jax

    from compressai_environment_tpu.models import FactorizedPrior
    from compressai_environment_tpu.utils.checkpoint import save_checkpoint

    m = FactorizedPrior(32, 48).init(key=jax.random.key(7))
    m.update(force=True)
    path = tmp_path_factory.mktemp("eval_golden_ck") / "fp.bin"
    save_checkpoint(m, path, architecture="bmshj2018-factorized")
    return path


@pytest.mark.parametrize("coder", ["ans", "tpu"])
def test_eval_model_matches_golden_json(dataset, checkpoint, capsys, coder):
    from compressai_environment_tpu.utils.eval_model.__main__ import main

    main([
        "checkpoint", str(dataset),
        "-a", "bmshj2018-factorized",
        "-c", coder,
        "-p", str(checkpoint),
    ])
    out = json.loads(capsys.readouterr().out)

    fixture = EXPECTED / f"eval_bmshj2018-factorized_{coder}.json"
    if GENERATE or not fixture.exists():
        fixture.write_text(json.dumps(out, indent=2))
        if GENERATE:
            pytest.skip("generated fixture")
    expected = json.loads(fixture.read_text())

    assert out["name"] == expected["name"]
    for k in NUMERIC_KEYS:
        np.testing.assert_allclose(
            out["results"][k], expected["results"][k],
            rtol=1e-4, atol=1e-4, err_msg=f"{coder}: {k} drifted",
        )


def test_both_coders_reconstruct_identically(dataset, checkpoint, capsys):
    """The two stream formats carry the same symbols: psnr/ms-ssim must
    agree exactly; only bpp differs (container overhead)."""
    from compressai_environment_tpu.utils.eval_model.__main__ import main

    outs = {}
    for coder in ("ans", "tpu"):
        main([
            "checkpoint", str(dataset),
            "-a", "bmshj2018-factorized",
            "-c", coder,
            "-p", str(checkpoint),
        ])
        outs[coder] = json.loads(capsys.readouterr().out)
    for k in ("psnr", "ms-ssim"):
        np.testing.assert_allclose(
            outs["ans"]["results"][k], outs["tpu"]["results"][k], rtol=1e-6
        )
