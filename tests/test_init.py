"""Package-root smoke tests: version + entropy-coder registry
(reference tests/test_init.py, tests/test_coder.py)."""

import pytest

import compressai_environment_tpu as cai


def test_version():
    assert isinstance(cai.__version__, str) and cai.__version__


class TestCoderRegistry:
    def test_default(self):
        assert cai.get_entropy_coder() == "ans"

    def test_available(self):
        assert "ans" in cai.available_entropy_coders()

    def test_set_valid(self):
        cai.set_entropy_coder("ans")
        assert cai.get_entropy_coder() == "ans"

    def test_set_invalid(self):
        with pytest.raises(ValueError, match="Invalid entropy coder"):
            cai.set_entropy_coder("huffman")
