# Development targets (analog of the reference Makefile quality gates)

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_nn_functional.py tests/test_ops.py tests/test_optim.py tests/test_parallel.py -q

lint:
	python -m ruff check holocron_tpu tests references scripts || true

native:
	$(MAKE) -C native

bench:
	python bench.py

.PHONY: test test-fast lint native bench
