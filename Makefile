# tpu_fluid build / test / bench entry points
.PHONY: all native test test-fast test-slow test-tpu bench clean

all: native

native:
	python -c "from tpu_fluid.native import build_library; print(build_library(force=True))"

test:
	python -m pytest tests/ -q

# CPU fast lane, parallelized with pytest-xdist (the single-process run is
# ~20 min of 8-way-mesh compiles; -n auto lands it well under 10 — timing
# in README "Running the tests")
test-fast:
	python -m pytest tests/ -q -m "not slow" -n auto

test-slow:
	python -m pytest tests/ -q -m slow -n auto

# real-TPU lane (needs a live TPU; ~8 min)
test-tpu:
	TPU_FLUID_TPU_TESTS=1 python -m pytest tests/tpu -q

bench:
	python bench.py

clean:
	rm -f tpu_fluid/native/librasterizer.so
	find . -name __pycache__ -type d | xargs rm -rf
