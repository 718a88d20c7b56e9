# Developer entry points (1-core host: expect long pytest runs).
# The conftest enables a persistent CPU compile cache, so a SECOND run of
# any target is ~4x faster; test-ci is the certifiable serial split with
# per-chunk timeouts (docs/BENCH_NOTES.md has measured times).

.PHONY: test test-fast test-ci bench bench-quick dryrun profile bisect

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_ops.py tests/test_config_cli.py \
	    tests/test_pallas_infonce.py tests/test_genesis.py -q

# Serial time-bounded chunks covering the whole non-slow suite; fails if
# any chunk fails or times out. (test_cli_pipeline.py is @slow.)
test-ci:
	python scripts/test_ci.py

bench:
	python bench.py

bench-quick:
	python bench.py --quick

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"

profile:
	PYTHONPATH=.:/root/.axon_site python -u scripts/profile_step.py

bisect:
	PYTHONPATH=.:/root/.axon_site python -u scripts/bisect_step.py
