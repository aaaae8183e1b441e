# tpu_fluid build / test / bench entry points
.PHONY: all native test bench clean

all: native

native:
	python -c "from tpu_fluid.native import build_library; print(build_library(force=True))"

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f tpu_fluid/native/librasterizer.so
	find . -name __pycache__ -type d | xargs rm -rf
