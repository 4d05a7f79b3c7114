# Developer entry points for pathtracing_tpu.
# (The reference's "dev tooling" is a broken VS Code task pointing at an
# unrelated project, SURVEY.md §2; these are the working equivalents.)

CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
MESH_ENV := $(CPU_ENV) XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: all native test test-fast bench bench-quick suite render clean

all: native

native:
	$(MAKE) -C native

# Full suite on the virtual 8-device CPU mesh (what CI runs).
test:
	$(MESH_ENV) python -m pytest tests/ -q

test-fast:
	$(MESH_ENV) python -m pytest tests/ -q -x -k "not parallel and not reference"

# Single-number driver benchmark (TPU if available).
bench:
	python bench.py

bench-quick:
	$(CPU_ENV) BENCH_QUICK=1 python bench.py

# Five-config BASELINE metric table -> benchmarks/RESULTS.md.
suite:
	python benchmarks/suite.py

# Composed seconds-to-RMSE table -> benchmarks/TIME_TO_QUALITY.md (TPU).
time-to-quality:
	python benchmarks/time_to_quality.py

# Quality headline + A-vs-B grounding (TPU, long; checkpointed/resumable).
quality:
	python benchmarks/quality_1024.py
	python benchmarks/quality_ab.py

render:
	python -m pathtracing_tpu.render --scene cornell_bsdf \
	    --width 512 --height 512 --spp 256 --out cornell.png

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
