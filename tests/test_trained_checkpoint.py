"""RD validation of the committed trained checkpoint.

The reference pins pretrained models to published RD results
(``tests/test_eval_model.py:77-124``, rtol 1e-4). With no network access,
the equivalent loop is closed with the in-repo trained checkpoint
(``tools/train_synth.py``): (a) a golden RD fixture (bpp, PSNR) on seeded
held-out content from the checkpoint's training family, and (b) the SAME
weights exported into the reference torch implementation
(``zoo.torch_import.params_to_state_dict``) must produce byte-identical
"rans" bitstreams and identical reconstructions.
"""

import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from compressai_environment_tpu.models import FactorizedPrior
from compressai_environment_tpu.utils.checkpoint import restore_into

REPO = Path(__file__).resolve().parent.parent
CKPT = REPO / "checkpoints" / "bmshj2018-factorized-synth-q5.msgpack"
EXPECTED = Path(__file__).parent / "expected" / "trained_ckpt_rd.json"
GENERATE = os.environ.get("GENERATE_EXPECTED") == "1"

pytestmark = pytest.mark.skipif(
    not CKPT.exists(), reason="trained checkpoint not present"
)


def _heldout(n=2, size=256):
    sys.path.insert(0, str(REPO / "tools"))
    from train_synth import synth_batch

    return synth_batch(1234, n, size, size).astype(np.float32)


@pytest.fixture(scope="module")
def model():
    m = FactorizedPrior(128, 192)
    restore_into(m, CKPT)
    return m


def _rd_point(model, x, fmt):
    model.stream_format = fmt
    c = model.compress(x)
    d = model.decompress(c["strings"], c["shape"])
    n_pix = x.shape[0] * x.shape[1] * x.shape[2]
    bpp = sum(len(s) for s in c["strings"][0]) * 8 / n_pix
    x_hat = np.clip(np.asarray(d["x_hat"], np.float32), 0, 1)
    mse = float(np.mean((x_hat - x) ** 2))
    return {"bpp": float(bpp), "psnr": float(10 * np.log10(1.0 / mse))}, c, x_hat


def test_rd_golden(model):
    """Golden (bpp, PSNR) on held-out content, both stream formats.
    GENERATE_EXPECTED=1 rewrites the fixture."""
    x = _heldout()
    got = {}
    for fmt in ("rans", "tpu"):
        rd, _, _ = _rd_point(model, x, fmt)
        got[fmt] = rd
    # sane operating point: inside the published bpp range, real fidelity
    assert 0.1 < got["rans"]["bpp"] < 2.0
    assert got["rans"]["psnr"] > 28.0

    if GENERATE or not EXPECTED.exists():
        EXPECTED.write_text(json.dumps(got, indent=2))
        if GENERATE:
            pytest.skip("generated fixture")
    exp = json.loads(EXPECTED.read_text())
    for fmt in ("rans", "tpu"):
        np.testing.assert_allclose(
            [got[fmt]["bpp"], got[fmt]["psnr"]],
            [exp[fmt]["bpp"], exp[fmt]["psnr"]],
            rtol=1e-4,
        )


def test_reference_runs_same_weights(model):
    """Export the trained params + baked tables into the reference torch
    FactorizedPrior: byte-identical bitstreams, identical decode, equal
    metrics — the reference's pretrained-eval regression without network."""
    from reference_pkg import available, load_reference

    if not available():
        pytest.skip("reference checkout or toolchain unavailable")
    torch = pytest.importorskip("torch")
    ref = load_reference()

    from compressai_environment_tpu.zoo.torch_import import params_to_state_dict

    net = ref.zoo.image_models["bmshj2018-factorized"](
        quality=5, pretrained=False
    )
    net.eval()
    sd = params_to_state_dict(
        model.params, net.state_dict(),
        tables={"entropy_bottleneck": model.tables["y"]},
    )
    net.load_state_dict(sd)

    x = _heldout()
    rd_ours, c_ours, xh_ours = _rd_point(model, x, "rans")

    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        c_ref = net.compress(x_t)
        d_ref = net.decompress(c_ref["strings"], c_ref["shape"])

    assert list(c_ref["strings"][0]) == list(c_ours["strings"][0]), (
        "trained-checkpoint bitstreams diverge from the reference run"
    )
    xh_ref = np.clip(
        d_ref["x_hat"].numpy().transpose(0, 2, 3, 1), 0, 1
    )
    err = np.abs(xh_ref - xh_ours).max()
    assert err < 1e-3, f"cross-implementation x_hat diff {err}"

    n_pix = x.shape[0] * x.shape[1] * x.shape[2]
    bpp_ref = sum(len(s) for s in c_ref["strings"][0]) * 8 / n_pix
    psnr_ref = 10 * np.log10(1.0 / float(np.mean((xh_ref - x) ** 2)))
    np.testing.assert_allclose(bpp_ref, rd_ours["bpp"], rtol=1e-6)
    np.testing.assert_allclose(psnr_ref, rd_ours["psnr"], rtol=1e-4)


def test_tpu_format_rate_overhead_bounded(model):
    """Rate-overhead regression gate (round-4 VERDICT item 8): the tpu
    interleaved-lane format may cost at most ~2 flush words + a packed
    count per lane over the reference-exact rans format. At the trained
    operating point (256x256, pick_lanes -> 16 lanes/image since the
    round-5 ~2048-symbols/lane small-tensor floor) that is ~0.008 bpp
    with the v3 varint header + bit-packed escapes; gate at +0.010 so
    future format or lane-policy changes cannot silently re-inflate the
    rate (historically +0.079 -> +0.015 -> +0.008)."""
    x = _heldout()
    rd = {}
    for fmt in ("rans", "tpu"):
        rd[fmt], _, _ = _rd_point(model, x, fmt)
    np.testing.assert_allclose(rd["rans"]["psnr"], rd["tpu"]["psnr"], rtol=1e-6)
    assert rd["tpu"]["bpp"] <= rd["rans"]["bpp"] + 0.010, (
        f"tpu-format rate overhead regressed: {rd['tpu']['bpp']:.4f} vs "
        f"rans {rd['rans']['bpp']:.4f}"
    )
