"""Temporal feature derivation (reference ``batch/job3_patron_temporal.py``).

The reference flips ``spark.sql.legacy.timeParserPolicy=LEGACY``
(``batch/job2_historico.py:15``) to survive its stringly timestamps; we
parse with explicit format strings instead and keep the modern parser.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WEEKEND_DAYS = ("Saturday", "Sunday")


def with_temporal_features(
    df: DataFrame,
    ts_col: str,
    hour_col: str = "hour",
    day_col: str = "day_name",
    weekend_col: str = "is_weekend",
    date_col: str = "event_date",
) -> DataFrame:
    """hour / English day-name / weekend flag / date, from a timestamp.

    Reference: ``batch/job3_patron_temporal.py:57-74`` (hour +
    ``date_format(ts,'EEEE')``) and ``:159-162`` (weekend via isin).
    """
    ts = F.col(ts_col)
    return (
        df.withColumn(hour_col, F.hour(ts))
        .withColumn(day_col, F.date_format(ts, "EEEE"))
        .withColumn(weekend_col, F.date_format(ts, "EEEE").isin(*WEEKEND_DAYS))
        .withColumn(date_col, F.to_date(ts))
    )


def account_age_days(created_col: str, as_of: Column) -> Column:
    """Account age in days (reference ``streaming/job1_bots.py:247`` uses
    ``datediff(current_date(), to_date(user_created))``; checked queries
    pass a frozen ``as_of`` to stay deterministic — FIXTURES.md §4)."""
    return F.datediff(as_of, F.to_date(F.col(created_col)))
