# Build/test harness (analogue of the reference's Makefile/Makefile.common)

PYTHON ?= python

.PHONY: all test test-fast native workflow bench clean

all: native test

native: native/libsloika_native.so

native/libsloika_native.so: native/sloika_native.cpp
	g++ -O3 -shared -fPIC -std=c++17 $< -o $@

test: native
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PYTHON) -m pytest tests/ -q

test-fast: native
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PYTHON) -m pytest tests/ -q -m "not slow"

# End-to-end workflow on the bundled reads (chunkify -> train -> validate ->
# basecall -> evaluate); the reference's `make workflow`
workflow: native
	bash scripts/workflow.sh

bench:
	$(PYTHON) bench.py

clean:
	rm -f native/libsloika_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
