# Developer convenience targets (the package itself builds the native lib
# on first use; see tokendagger_tpu/native/__init__.py).

NATIVE_SRC := tokendagger_tpu/native/tdnative.cpp
CACHE_DIR  := $(or $(TOKENDAGGER_TPU_CACHE),$(HOME)/.cache/tokendagger_tpu)

.PHONY: all native test test-all bench fuzz clean

all: native

native:
	python -c "from tokendagger_tpu.native import get_lib; \
	           lib = get_lib(); \
	           print('native lib:', 'OK' if lib else 'UNAVAILABLE')"

test:
	python -m pytest tests/ -x -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py

fuzz:
	python tests/fuzz_scanner.py 2000

clean:
	rm -rf $(CACHE_DIR)/tdnative_*.so $(CACHE_DIR)/tables_*.npz
	find . -name __pycache__ -type d -exec rm -rf {} +
