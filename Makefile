# Development targets (mirrors the reference Makefile's surface)

PYTEST := python -m pytest

.PHONY: tests tests-fast tests-pure tests-matrix bench check-format clean

tests:
	$(PYTEST) tests/ -q

tests-fast:
	$(PYTEST) tests/ -q -x -m "not slow"

# env matrix entry: the pure (no-torch) table-baking path. Byte-exactness
# fixtures pinned to torch baking auto-skip; everything else (round trips,
# codec paths, CLIs) must stay green, and tests/test_pure_tables.py
# enforces the documented divergence bound in the default run.
tests-pure:
	COMPRESSAI_TPU_PURE_TABLES=1 $(PYTEST) tests/ -q -x -m "not slow"

tests-matrix: tests-fast tests-pure

bench:
	python bench.py

clean:
	rm -rf compressai_environment_tpu/csrc/_build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
