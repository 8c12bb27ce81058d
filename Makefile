# Development targets (analog of the reference Makefile quality gates).
# Every gate FAILS on violations — a gate that can't fail isn't a gate.

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_nn_functional.py tests/test_ops.py tests/test_optim.py tests/test_parallel.py -q

# stdlib-only gate that works in any environment (syntax, unused imports, hygiene)
lint:
	python scripts/lint.py

# full gates for environments with dev tools installed (CI runs these)
lint-full:
	python -m ruff check holocron_tpu tests references scripts api demo

typing:
	python -m mypy holocron_tpu

native:
	$(MAKE) -C native

bench:
	python bench.py

docs:
	$(MAKE) -C docs html

.PHONY: test test-fast lint lint-full typing native bench docs
