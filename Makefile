# Convenience targets (the reference ships a root Makefile, Makefile:1-68;
# this is the TPU-framework equivalent — no build step for the Python
# package, native host kernels live in native/).

PY ?= python

.PHONY: all native test test-fast test-corridor bench bench-step dryrun \
	run clean

all: native

native:
	$(MAKE) -C native

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow"

# Turek 2D-2 unsteady shedding corridor (drag/lift/Strouhal vs published
# values; ~35 min on one CPU core). Not part of the default gate — run
# periodically (e.g. weekly) so shedding physics can't silently regress.
test-corridor:
	NS_CORRIDOR=1 $(PY) -m pytest tests/test_turek_unsteady.py -q -m slow

# operator-apply throughput (gls-vmult equivalent); runs on the attached TPU
bench:
	$(PY) bench.py

# BASELINE time/step lane (Turek 3D Re100)
bench-step:
	$(PY) bench_step.py

# multi-chip sharding dry run on an 8-device virtual CPU mesh
dryrun:
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# gls-app equivalent; pass INPUT=input/<config>.json
INPUT ?= input/channel.json
run:
	$(PY) run_simulation.py $(INPUT)

clean:
	rm -f results*.vtu *_drag_lift_pressure.m
	$(MAKE) -C native clean 2>/dev/null || true
