# Repo tooling (the reference's Makefile declares quality/test targets;
# ours adds the bench and multichip dry-run).

.PHONY: test test-fast quality bench dryrun

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow" -k "not end_to_end"

quality:
	python -m compileall -q dyffusion_tpu bench.py __graft_entry__.py
	python scripts/check_citations.py

bench:
	python bench.py

bench-train:
	python scripts/bench_train.py

bench-schedule-quality:
	python scripts/bench_schedule_quality.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
