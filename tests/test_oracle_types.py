"""Driver-safe oracle output types.

The driver hashes stringified result frames.  Two DuckDB/pandas type
artifacts can make IDENTICAL values hash differently:

- ``SUM(<integer>)`` is HUGEINT (int128) in DuckDB; pandas renders it
  float64 (``3.99e+11``) while Spark's BIGINT stays int64.  Round-1
  evidence: the only three driver hash-fails were the only three
  checked queries emitting HUGEINT.
- LIST columns become numpy arrays via DuckDB but Python lists via
  Spark ``toPandas`` — ``'[0 1]'`` vs ``'[0, 1]'``.

``suite._typed_oracle`` re-types every mapped integer aggregate via
``SELECT * REPLACE (CAST(...))``; this sweep guards the whole registry
so no future query can reintroduce either hazard (add the column to
``_ORACLE_BIGINT_COLS`` or emit a joined string instead).
"""

from __future__ import annotations

import duckdb
import pytest

from kafka_bigdata_jobs_spark import suite
from tests.conftest import SF_SMOKE
from tests.oracle_harness import duckdb_conn

RISKY_FRAGMENTS = ("HUGEINT", "DECIMAL", "[]", "STRUCT", "MAP")


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    return duckdb_conn(SF_SMOKE)


def test_no_driver_unsafe_types_in_any_oracle(con):
    offenders = []
    for name, q in sorted(suite.registry().items()):
        if q.oracle is None:
            continue
        desc = con.execute(
            f"DESCRIBE SELECT * FROM ({q.oracle}) __sweep LIMIT 0"
        ).fetchall()
        for col, typ, *_ in desc:
            t = typ.upper()
            if any(frag in t for frag in RISKY_FRAGMENTS):
                offenders.append(f"{name}.{col}: {typ}")
    assert offenders == [], (
        "driver-unsafe oracle output types (HUGEINT→float64 / array "
        f"stringification hazards): {offenders} — add to "
        "_ORACLE_BIGINT_COLS or emit a canonical string"
    )


def test_bigint_map_has_no_stale_entries():
    """Every mapped query must still exist and be oracle-backed —
    otherwise the map silently rots."""
    reg = suite.registry()
    for name in suite._ORACLE_BIGINT_COLS:
        assert name in reg, f"stale _ORACLE_BIGINT_COLS entry: {name}"
        assert reg[name].oracle is not None, f"{name} is rows-only but mapped"


def test_wrapper_preserves_values(con):
    """The REPLACE wrapper must change types only, never values/rows:
    spot-check one wrapped query against its unwrapped core."""
    q = suite.registry()["monthly_rollup"]
    assert "* REPLACE" in q.oracle
    inner = q.oracle.split("FROM (\n", 1)[1].rsplit("\n) __typed", 1)[0]
    a = con.execute(q.oracle).fetchall()
    b = con.execute(inner).fetchall()
    assert [tuple(map(str, r)) for r in a] == [tuple(map(str, r)) for r in b]
