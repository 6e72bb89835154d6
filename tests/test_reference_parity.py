"""End-to-end bit-exactness against the REAL reference implementation.

The reference package (torch models + its C++ rANS coder, compiled locally —
see ``reference_pkg.py``) is the oracle. For every image architecture we:

1. build a seeded, randomly-initialized reference model and bake its CDF
   tables with ``net.update(force=True)`` (reference ``models/google.py:87``),
2. import its ``state_dict()`` into this framework via
   ``zoo.torch_import.load_state_dict``,
3. assert **byte-identical bitstreams** from ``compress`` on the same image,
4. cross-decode: the reference decodes our bytes and we decode the
   reference's bytes, asserting reconstructions agree,
5. rebuild the CDF tables with our own ``update(force=True)`` pipeline and
   assert integer-exact equality with the reference's baked tables.

This is the cross-implementation strengthening of the reference's own parity
bar (md5'd bitstreams from ``tests/test_codec.py:91-153``).
"""

import os

import numpy as np
import pytest

from reference_pkg import available, load_reference

pytestmark = pytest.mark.skipif(
    not available(), reason="reference checkout or toolchain unavailable"
)

# byte-exact table reproduction requires the torch-exact baking path;
# the pure fallback's documented divergence bound has its own test
# (tests/test_pure_tables.py)
needs_torch_baking = pytest.mark.skipif(
    bool(os.environ.get("COMPRESSAI_TPU_PURE_TABLES")),
    reason="byte-exactness pins torch-exact table baking",
)


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _flatten_strings(strings):
    """Normalize the nested strings structure to a flat list of bytes."""
    out = []

    def walk(s):
        if isinstance(s, (bytes, bytearray)):
            out.append(bytes(s))
        else:
            for item in s:
                walk(item)

    walk(strings)
    return out


def _ref_model(ref, arch, quality=1, seed=0):
    import torch

    torch.manual_seed(seed)
    net = ref.zoo.image_models[arch](quality=quality, pretrained=False)
    net.eval()
    net.update(force=True)
    return net


def _our_model_from(net_sd, arch, quality=1):
    from compressai_environment_tpu.zoo.image import cfgs, model_architectures
    from compressai_environment_tpu.zoo.torch_import import load_state_dict

    model = model_architectures[arch](*cfgs[arch][quality])
    load_state_dict(model, net_sd)
    return model


ARCHS = [
    "bmshj2018-factorized",
    "bmshj2018-hyperprior",
    "mbt2018-mean",
    "mbt2018",
    "cheng2020-anchor",
    "cheng2020-attn",
]


# ---------------------------------------------------------------------------
# primitive parity
# ---------------------------------------------------------------------------


def test_pmf_to_quantized_cdf_parity(ref, rng):
    """Our CDF quantizer == the reference C++ one on random PMFs, including
    zero bins and heavy tails (the freq-stealing repair, ``ops.cpp:74-100``)."""
    from compressai_environment_tpu._CXX import pmf_to_quantized_cdf

    from compressai._CXX import pmf_to_quantized_cdf as ref_cdf

    for trial in range(200):
        n = int(rng.integers(1, 40))
        pmf = rng.random(n).astype(np.float32)
        # sprinkle exact zeros and tiny probabilities
        if trial % 3 == 0:
            pmf[rng.integers(0, n, size=max(1, n // 3))] = 0.0
        if trial % 5 == 0:
            pmf *= 1e-6
        try:
            theirs = list(ref_cdf(pmf.tolist(), 16))
        except ValueError:
            theirs = "raise"  # total==0 or invalid pmf rejected
        try:
            ours = list(pmf_to_quantized_cdf(pmf.tolist(), 16))
        except ValueError:
            ours = "raise"
        assert ours == theirs, f"trial {trial}: {pmf}"


def test_coder_parity_random_streams(ref, rng):
    """Byte equality + bidirectional decode between our coder and the
    reference ``BufferedRansEncoder``/``RansDecoder``
    (``rans_interface.cpp:108-284``), including bypass escapes."""
    from compressai.ans import BufferedRansEncoder, RansDecoder

    from compressai_environment_tpu._CXX import pmf_to_quantized_cdf
    from compressai_environment_tpu.entropy import coder as our_coder

    for trial in range(20):
        ncdf = int(rng.integers(1, 8))
        cdfs, sizes, offsets = [], [], []
        max_len = 0
        for _ in range(ncdf):
            support = int(rng.integers(2, 24))
            pmf = rng.random(support).astype(np.float64) + 1e-3
            pmf /= pmf.sum()
            cdf = pmf_to_quantized_cdf((pmf * 0.99).tolist(), 16)
            cdfs.append(list(cdf))
            sizes.append(len(cdf))
            offsets.append(int(rng.integers(-10, 10)))
            max_len = max(max_len, len(cdf))
        cdf_mat = np.zeros((ncdf, max_len), dtype=np.int32)
        for i, c in enumerate(cdfs):
            cdf_mat[i, : len(c)] = c

        n = int(rng.integers(1, 400))
        indexes = rng.integers(0, ncdf, size=n).astype(np.int32)
        symbols = np.empty(n, dtype=np.int32)
        for i in range(n):
            k = indexes[i]
            lo = offsets[k]
            hi = lo + sizes[k] - 2  # max coded symbol (escape at top)
            if rng.random() < 0.1:  # force bypass escapes
                symbols[i] = hi + int(rng.integers(1, 100))
            elif rng.random() < 0.05:
                symbols[i] = lo - int(rng.integers(1, 100))
            else:
                symbols[i] = int(rng.integers(lo, hi + 1))

        enc = BufferedRansEncoder()
        enc.encode_with_indexes(
            symbols.tolist(), indexes.tolist(), cdfs, sizes, offsets
        )
        ref_bytes = enc.flush()
        our_bytes = our_coder.encode_with_indexes(
            symbols, indexes, cdf_mat, np.asarray(sizes), np.asarray(offsets)
        )
        assert our_bytes == ref_bytes, f"trial {trial}: stream mismatch"

        # reference decodes our bytes
        dec = RansDecoder()
        rec = dec.decode_with_indexes(
            our_bytes, indexes.tolist(), cdfs, sizes, offsets
        )
        np.testing.assert_array_equal(np.asarray(rec), symbols)
        # we decode the reference's bytes
        ours_rec = our_coder.decode_with_indexes(
            ref_bytes, indexes, cdf_mat, np.asarray(sizes), np.asarray(offsets)
        )
        np.testing.assert_array_equal(ours_rec, symbols)


# ---------------------------------------------------------------------------
# model-level parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("arch", ARCHS)
def test_model_bitstream_parity(ref, arch):
    import torch

    torch.manual_seed(7)
    x_t = torch.rand(1, 3, 128, 128)
    x_np = x_t.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    net = _ref_model(ref, arch)
    model = _our_model_from(net.state_dict(), arch)

    with torch.no_grad():
        ref_out = net.compress(x_t)
    our_out = model.compress(x_np)

    ref_strings = _flatten_strings(ref_out["strings"])
    our_strings = _flatten_strings(our_out["strings"])
    assert len(ref_strings) == len(our_strings)
    for i, (a, b) in enumerate(zip(our_strings, ref_strings)):
        assert a == b, (
            f"{arch}: stream {i} differs (ours {len(a)}B vs ref {len(b)}B)"
        )
    assert tuple(our_out["shape"]) == tuple(ref_out["shape"])

    # cross-decode: reference decodes our bytes; we decode the reference's
    with torch.no_grad():
        ref_dec = net.decompress(our_out["strings"], ref_out["shape"])
    our_dec = model.decompress(ref_out["strings"], our_out["shape"])

    ref_xhat = ref_dec["x_hat"].numpy().transpose(0, 2, 3, 1)
    our_xhat = np.asarray(our_dec["x_hat"])
    err = np.abs(ref_xhat - our_xhat).max()
    assert err < 1e-3, f"{arch}: cross-decoded x_hat max abs diff {err}"


@needs_torch_baking
def test_ssf2020_video_bitstream_parity(ref):
    """ssf2020: byte-identical GOP bitstreams (keyframe + motion/residual
    streams for every inter frame) and cross-decode, vs the reference
    ``ScaleSpaceFlow`` (``models/video/google.py:394-435``)."""
    import torch

    from compressai_environment_tpu.zoo.torch_import import load_state_dict_video
    from compressai_environment_tpu.zoo.video import ssf2020

    torch.manual_seed(3)
    net = ref.zoo.video_models["ssf2020"](quality=1, pretrained=False)
    net.eval()
    net.update(force=True)

    model = ssf2020(quality=1)
    load_state_dict_video(model, net.state_dict())
    # rebuild tables with our own update() pipeline: must be byte-compatible
    model.tables.clear()
    model.update(force=True)

    torch.manual_seed(11)
    frames_t = [torch.rand(1, 3, 128, 128) for _ in range(3)]
    frames_np = [f.numpy().transpose(0, 2, 3, 1) for f in frames_t]

    with torch.no_grad():
        ref_strings, ref_shapes = net.compress(frames_t)
    our_strings, our_shapes = model.compress(frames_np)

    ref_flat = _flatten_strings(
        [list(s.values()) if isinstance(s, dict) else s for s in ref_strings]
    )
    our_flat = _flatten_strings(
        [list(s.values()) if isinstance(s, dict) else s for s in our_strings]
    )
    assert len(ref_flat) == len(our_flat)
    for i, (a, b) in enumerate(zip(our_flat, ref_flat)):
        assert a == b, f"ssf2020 stream {i} differs ({len(a)}B vs {len(b)}B)"

    # cross-decode: we decode the reference's streams
    our_dec = model.decompress(ref_strings, ref_shapes)
    with torch.no_grad():
        ref_dec = net.decompress(our_strings, our_shapes)
    for i, (ours, theirs) in enumerate(zip(our_dec, ref_dec)):
        a = np.asarray(ours)
        b = theirs.numpy().transpose(0, 2, 3, 1)
        err = np.abs(a - b).max()
        assert err < 1e-2, f"ssf2020 frame {i} cross-decode max diff {err}"


@needs_torch_baking
@pytest.mark.parametrize("arch", ARCHS)
def test_update_builds_identical_tables(ref, arch):
    """Our ``update(force=True)`` from imported weights reproduces the
    reference's baked integer CDF tables exactly (EB density sampling +
    Gaussian scale-table rows + CDF quantization)."""
    net = _ref_model(ref, arch)
    sd = net.state_dict()
    model = _our_model_from(sd, arch)
    model.tables.clear()
    model.update(force=True)

    def check(prefix, table):
        ref_cdf = sd[f"{prefix}._quantized_cdf"].numpy()
        ref_len = sd[f"{prefix}._cdf_length"].numpy().reshape(-1)
        ref_off = sd[f"{prefix}._offset"].numpy().reshape(-1)
        cdf = np.asarray(table.quantized_cdf)
        length = np.asarray(table.cdf_length).reshape(-1)
        offset = np.asarray(table.offset).reshape(-1)
        np.testing.assert_array_equal(length, ref_len)
        np.testing.assert_array_equal(offset, ref_off)
        assert cdf.shape[0] == ref_cdf.shape[0]
        for r in range(cdf.shape[0]):
            L = int(ref_len[r])
            np.testing.assert_array_equal(
                cdf[r, :L], ref_cdf[r, :L], err_msg=f"{prefix} row {r}"
            )

    if "z" in model.tables:
        check("entropy_bottleneck", model.tables["z"])
        check("gaussian_conditional", model.tables["y"])
    else:
        check("entropy_bottleneck", model.tables["y"])
