# Mirrors the reference's make targets (reference Makefile:8-31)
.PHONY: test test-unit parity bench scale-probe

test:
	python -m pytest tests/ -q

test-unit:
	python -m pytest tests/ -q -x

parity:
	python tools/parity.py /root/testdata/sf0.001

parity-full:
	python tools/parity.py /root/testdata/sf0.01

bench:
	python bench.py

scale-probe:
	python tools/scale_probe.py 20

drift-check:
	python tools/drift_check.py
