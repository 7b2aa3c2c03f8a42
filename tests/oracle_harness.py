"""Differential oracle harness — mirrors the driver's correctness gate.

Runs each registered query's PySpark impl and DuckDB oracle SQL over the
same parquet tables, then compares row count, column names, and values
(order-insensitive, column-name-sorted, float-tolerant below the
explicit rounding the suite applies).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from kafka_bigdata_jobs_spark.schemas import TEST_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT numerically merged with float: the driver
        # compares stringified values, so a Spark Decimal output (e.g.
        # SQL's bare 100.0 literal parsing as DECIMAL) must flag here.
        return f"decimal:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def rows_normalized(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(map(repr, t)))


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    sc, sn = rows_normalized(s_cols, s_rows)
    dc, dn = rows_normalized(d_cols, d_rows)
    if not problems and sn != dn:
        for i, (a, b) in enumerate(zip(sn, dn)):
            if a != b:
                problems.append(f"first value mismatch at sorted-row {i} (cols {sc}): spark={a} duckdb={b}")
                break
        else:
            problems.append("value multiset differs (tail rows)")
    return problems
