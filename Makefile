# Repo tooling (the reference's Makefile declares quality/style/test/fix-copies
# targets over utils/{check_copies,release,get_modified_files}.py; ours mirrors
# that with tools/ and adds the bench and multichip dry-run).

.PHONY: test test-fast quality modified-quality fix-copies bench dryrun install package ci

check_dirs := dyffusion_tpu tests tools scripts

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow" -k "not end_to_end"

# full suite sharded over CPU workers (multicore hosts; loadscope keeps each
# module's trained fixtures on one worker). This 1-core dev host gains
# nothing — the gate-time lever here is the persistent compilation cache
# tests/conftest.py points at .jax_cache_tests/.
test-par:
	python -m pytest tests/ -q -n auto --dist loadscope

quality:
	python -m compileall -q dyffusion_tpu tools bench.py __graft_entry__.py
	python scripts/check_citations.py
	python tools/check_copies.py

# lint-on-diff: quality checks restricted to files modified since main's fork
# point (ref `modified_only_fixup`)
modified-quality:
	$(eval modified_py := $(shell python tools/get_modified_files.py $(check_dirs)))
	@if test -n "$(modified_py)"; then \
		echo "checking $(modified_py)"; \
		python -m compileall -q $(modified_py); \
	else \
		echo "no modified .py files"; \
	fi

fix-copies:
	python tools/check_copies.py --fix

install:
	pip install -e . --no-build-isolation

package:
	pip wheel . --no-build-isolation --no-deps -w dist/

bench:
	python bench.py

bench-train:
	python scripts/bench_train.py

bench-schedule-quality:
	python scripts/bench_schedule_quality.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# the per-push CI gate (.github/workflows/ci.yaml), runnable locally
ci: quality test-fast
