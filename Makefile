# Pre-snapshot gate (VERDICT r2 #1): nothing ships unless the suite, the
# driver entry points, and (on TPU) the bench all run green.
#   make check        — pytest + single-chip entry + 8-device virtual dryrun
#   make check-bench  — the above + bench.py (requires a real TPU chip)

PY ?= python

.PHONY: check check-bench test entry dryrun bench lint

lint:
	$(PY) tools/lint.py

test:
	$(PY) -m pytest tests/ -x -q

entry:
	$(PY) __graft_entry__.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	DRYRUN_DEVICES=8 $(PY) __graft_entry__.py

bench:
	$(PY) bench.py

check: lint test dryrun

check-bench: check bench
