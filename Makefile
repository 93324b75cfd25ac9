# Build / test entry points (reference parity: Makefile + tools/run_tests.sh)

.PHONY: all native test bench clean

all: native

native:
	python -m epsilon_tpu.native.build

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f epsilon_tpu/native/libepsilon_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
