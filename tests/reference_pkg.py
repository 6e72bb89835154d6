"""Load the actual reference CompressAI package for parity testing.

The reference's two pybind11 extensions (``compressai.ans`` from
``cpp_exts/rans/rans_interface.cpp`` and ``compressai._CXX`` from
``cpp_exts/ops/ops.cpp``) are compiled locally with g++ against the pybind11
headers bundled inside torch (no network, no pip). The resulting shared
objects are pre-registered in ``sys.modules`` so that importing
``compressai`` from the read-only reference checkout resolves them without
writing into the checkout.

This makes the *real* reference implementation — its C++ entropy coder, its
torch models, its ``update()`` pipeline — available as an oracle, matching
the parity bar of ``/root/reference/tests/test_codec.py:91-153`` (md5'd
bitstreams) but strengthened to byte-for-byte cross-implementation checks.
"""

from __future__ import annotations

import functools
import importlib.util
import shutil
import subprocess
import sys
import sysconfig
from pathlib import Path

REF_ROOT = Path("/root/reference")
BUILD_DIR = Path("/tmp/compressai_ref_ext")


def _torch_pybind11_include():
    try:
        import torch
    except ImportError:
        return None
    inc = Path(torch.__file__).parent / "include"
    return inc if (inc / "pybind11" / "pybind11.h").exists() else None


def available() -> bool:
    return (
        REF_ROOT.exists()
        and shutil.which("g++") is not None
        and _torch_pybind11_include() is not None
    )


def _compile(src_files, include_dirs, out: Path) -> None:
    if out.exists() and all(
        out.stat().st_mtime > Path(s).stat().st_mtime for s in src_files
    ):
        return
    cmd = [
        "g++", "-std=c++17", "-O3", "-shared", "-fPIC",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{_torch_pybind11_include()}",
        *[f"-I{d}" for d in include_dirs],
        *[str(s) for s in src_files],
        "-o", str(out),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _preload(name: str, path: Path) -> None:
    if name in sys.modules:
        return
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)


@functools.lru_cache(maxsize=1)
def load_reference():
    """Build extensions if needed and return the imported ``compressai``."""
    if not available():
        raise RuntimeError("reference toolchain unavailable")
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    rans_dir = REF_ROOT / "compressai" / "cpp_exts" / "rans"
    _compile(
        [rans_dir / "rans_interface.cpp"],
        [REF_ROOT / "third_party" / "ryg_rans", rans_dir],
        BUILD_DIR / "ans.so",
    )
    _compile(
        [REF_ROOT / "compressai" / "cpp_exts" / "ops" / "ops.cpp"],
        [],
        BUILD_DIR / "_CXX.so",
    )
    _preload("compressai.ans", BUILD_DIR / "ans.so")
    _preload("compressai._CXX", BUILD_DIR / "_CXX.so")
    if str(REF_ROOT) not in sys.path:
        sys.path.insert(0, str(REF_ROOT))
    import compressai  # noqa: F401
    import compressai.zoo  # noqa: F401  (not pulled in by the package root)

    return compressai
