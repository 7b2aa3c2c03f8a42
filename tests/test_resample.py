"""Gap fill: hand-computed twin for LOCF and integer interpolation."""

from __future__ import annotations

import datetime as dt

from kafka_bigdata_jobs_spark.operators.resample import daily_spine, gap_fill_daily


def _d(day: int) -> dt.date:
    return dt.date(2024, 1, day)


def test_spine_covers_first_to_last_per_key(spark):
    df = spark.createDataFrame(
        [(1, _d(3), 10), (1, _d(7), 20), (2, _d(5), 5)],
        "k: long, day: date, v: long",
    )
    got = sorted((r.k, r.day) for r in daily_spine(df, "k", "day").collect())
    assert got == [(1, _d(i)) for i in range(3, 8)] + [(2, _d(5))]


def test_locf_and_integer_interpolation(spark):
    # key 1: obs at day 1 (100) and day 4 (400) -> gap days 2,3
    #   locf: 100, 100 ; interp: (100*2+400*1)//3=200, (100*1+400*2)//3=300
    # key 2: single obs -> spine is that one day, both fills equal it
    df = spark.createDataFrame(
        [(1, _d(1), 100), (1, _d(4), 400), (2, _d(9), 7)],
        "k: long, day: date, v: long",
    )
    rows = {
        (r.k, r.day): (r.observed, r.locf_value, r.interp_value)
        for r in gap_fill_daily(df, "k", "day", "v").collect()
    }
    assert rows == {
        (1, _d(1)): (True, 100, 100),
        (1, _d(2)): (False, 100, 200),
        (1, _d(3)): (False, 100, 300),
        (1, _d(4)): (True, 400, 400),
        (2, _d(9)): (True, 7, 7),
    }


def test_interp_floor_matches_python_floordiv(spark):
    # non-thirds gap: (10*(3-1) + 25*(1-0)) // 3 = 45//3 = 15 on day 1,
    # (10*1 + 25*2) // 3 = 60//3 = 20 on day 2 — exact; and a case that
    # actually floors: obs 0 and 10 across a 3-day gap.
    df = spark.createDataFrame(
        [(1, _d(1), 0), (1, _d(4), 10)], "k: long, day: date, v: long"
    )
    rows = {
        r.day: r.interp_value
        for r in gap_fill_daily(df, "k", "day", "v").collect()
    }
    assert rows == {_d(1): 0, _d(2): 10 // 3, _d(3): 20 // 3, _d(4): 10}
