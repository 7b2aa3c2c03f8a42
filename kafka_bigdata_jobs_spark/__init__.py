"""kafka_bigdata_jobs_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the capabilities of the
reference system ``Chega123/kafka_bigdata_jobs`` (a Kafka + Structured
Streaming + batch tweet-analytics stack), extended with the operators a
large-scale training-data pipeline needs (dedup, similarity search, text
quality analysis, multimodal plumbing).

Design stance (see SURVEY.md §7):

- Operators are pure ``DataFrame -> DataFrame`` functions, parameterized
  by column names, usable identically in batch and streaming (the
  reference duplicates every transform between its batch/ and streaming/
  trees; we implement each exactly once).
- No custom IR / planner: the DataFrame API *is* the logical plan and
  Catalyst + Tungsten + AQE do the physical planning.
- Scale defaults: AQE on, broadcast joins for dims, explicit pivot
  values, no ``collect()`` in operator code, expression-first (UDFs only
  where column expressions genuinely cannot express the semantics).
"""

__version__ = "0.1.0"

# Guarded OpenBLAS misdetection fix (r9): must run before numpy first
# loads the BLAS — package import is the earliest hook shared by the
# driver, bench.py, tests, and Spark python workers (which import this
# package when unpickling operator closures).  No-op on hosts where
# OpenBLAS detects the CPU correctly; see _blas.py.
from ._blas import fix_openblas_env as _fix_openblas_env  # noqa: E402

_fix_openblas_env()
del _fix_openblas_env
