"""Regression (round-2 advisor): ``event_type_trend_slopes`` r2_bp on
degenerate groups.

A group with a single active day (zero x-variance) or constant daily
counts (zero y-variance) makes the r² denominator 0.  Spark's ``div``
yields NULL there but DuckDB's ``//`` raises — without the explicit
CASE guard the two engines diverge exactly when real data degenerates.
This test builds such a fixture and runs the full differential check.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from kafka_bigdata_jobs_spark import suite
from tests.oracle_harness import compare


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_sf")
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    # 'single_day': one active day -> slope_den = 0.
    for i in range(5):
        rows.append(("single_day", 1, base + dt.timedelta(minutes=i)))
    # 'constant': 3 days x exactly 2 events/day -> zero y-variance.
    for day in range(3):
        for i in range(2):
            rows.append(
                ("constant", 2, base + dt.timedelta(days=day, minutes=i)))
    # 'trending': a clean upward trend, the non-degenerate control.
    for day in range(4):
        for i in range(day + 1):
            rows.append(
                ("trending", 3, base + dt.timedelta(days=day, minutes=i)))
    pdf = pd.DataFrame(rows, columns=["event_type", "user_id", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_degenerate_groups_agree_with_oracle(spark, degenerate_dir):
    reg = suite.registry()["event_type_trend_slopes"]
    df = reg.fn(spark, degenerate_dir)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{degenerate_dir}/events.parquet'")
    assert compare(df, con, reg.oracle) == []

    by_type = {r["event_type"]: r for r in df.collect()}
    assert by_type["single_day"]["r2_bp"] is None
    assert by_type["single_day"]["slope_den"] == 0
    assert by_type["constant"]["r2_bp"] is None
    assert by_type["constant"]["slope_num"] == 0
    # Perfect linear trend: r^2 == 1 exactly -> 10000 bp.
    assert by_type["trending"]["r2_bp"] == 10000
