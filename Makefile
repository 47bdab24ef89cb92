# Convenience targets. The native library is optional (numpy fallbacks
# exist) but recommended for input-pipeline throughput.

.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
