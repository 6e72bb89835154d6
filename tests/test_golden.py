"""Golden-file regression tests (reference GENERATE_EXPECTED pattern,
tests/test_codec.py:42-43): bitstream md5s for seeded models on fixed inputs.

Run with ``GENERATE_EXPECTED=1`` to (re)write the fixtures. These anchor the
bitstream formats across refactors: any md5 change means a format or
numerics change and must be deliberate.

CPU-only determinism: conftest pins the platform, matmul precision, and
torch threads; jax's threefry RNG is platform-stable.
"""

import hashlib
import json
import os
from pathlib import Path

import jax
import numpy as np
import pytest

EXPECTED = Path(__file__).parent / "expected"
GENERATE = os.environ.get("GENERATE_EXPECTED") == "1"

# md5 fixtures are generated with torch-exact table baking; the pure
# fallback's tables differ by design (bounded by tests/test_pure_tables.py)
pytestmark = pytest.mark.skipif(
    bool(os.environ.get("COMPRESSAI_TPU_PURE_TABLES")),
    reason="fixtures pin torch-exact-baked tables",
)


def _image():
    rng = np.random.default_rng(1234)
    base = rng.random((1, 8, 16, 3), dtype=np.float32)
    return np.clip(np.kron(base, np.ones((1, 8, 8, 1), np.float32)), 0, 1)


def _md5(strings) -> str:
    h = hashlib.md5()
    for group in strings:
        for s in group:
            h.update(s)
    return h.hexdigest()


def _check(name: str, digest: str):
    path = EXPECTED / f"md5-{name}.json"
    if GENERATE or not path.exists():
        path.parent.mkdir(exist_ok=True)
        path.write_text(json.dumps({"md5": digest}))
        if GENERATE:
            pytest.skip("generated fixture")
    expected = json.loads(path.read_text())["md5"]
    assert digest == expected, (
        f"{name}: bitstream md5 changed ({digest} != {expected}). "
        "Format/numerics drift — regenerate with GENERATE_EXPECTED=1 only "
        "if intentional."
    )


@pytest.mark.parametrize("fmt", ["rans", "tpu"])
def test_factorized_bitstream_stable(fmt):
    from compressai_environment_tpu.models import FactorizedPrior

    m = FactorizedPrior(16, 24).init(key=jax.random.key(7), input_shape=(1, 64, 128, 3))
    m.update(force=True)
    m.stream_format = fmt
    c = m.compress(_image())
    _check(f"factorized-{fmt}", _md5(c["strings"]))


@pytest.mark.parametrize("fmt", ["rans", "tpu"])
def test_mbt2018_bitstream_stable(fmt):
    from compressai_environment_tpu.models import JointAutoregressiveHierarchicalPriors

    m = JointAutoregressiveHierarchicalPriors(16, 24).init(
        key=jax.random.key(7), input_shape=(1, 64, 128, 3)
    )
    m.update(force=True)
    m.stream_format = fmt
    c = m.compress(_image())
    _check(f"mbt2018-{fmt}", _md5(c["strings"]))
