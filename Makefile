# Development targets (mirrors the reference Makefile's surface)

PYTEST := python -m pytest

.PHONY: tests tests-fast bench check-format clean

tests:
	$(PYTEST) tests/ -q

tests-fast:
	$(PYTEST) tests/ -q -x -m "not slow"

bench:
	python bench.py

clean:
	rm -rf compressai_environment_tpu/csrc/_build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
