# Developer targets — all run on the local[32] sandbox layout.

PY ?= python

.PHONY: test bench correctness-local coverage

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

# Regenerate the full repo-side correctness matrix: EVERY registered
# query, strict (driver-discipline) comparison vs DuckDB at sf0.001 and
# sf0.01.  tests/test_correctness_matrix.py pins this file's freshness
# against the registry, so rerun this target whenever queries change.
correctness-local:
	$(PY) -m kafka_bigdata_jobs_spark matrix --out CORRECTNESS_local.json

# Refresh COVERAGE.md's verified-by column from the union of committed
# CORRECTNESS artifacts (driver rounds + the local matrix).
coverage:
	$(PY) tools/refresh_coverage.py
